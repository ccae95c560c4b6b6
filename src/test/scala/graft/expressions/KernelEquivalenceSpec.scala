package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{Text, Vectors}
import graft.operators.MinHashLSH

/** The codegen kernels must be bit-identical to their pure-`functions._`
  * reference implementations — the DuckDB oracles were validated against
  * the latter. Compared on the real fixture tables (every document /
  * embedding row at sf0.001), not just hand-picked samples.
  */
class KernelEquivalenceSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def assertNoDiff(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.filter(!(col("a") <=> col("b")))
    assert(bad.count() === 0, bad.limit(5).collect().mkString("; "))
  }

  test("PolyHash == HOF charHash on every document") {
    assertNoDiff(docs.select(
      Text.charHash(lower(col("text"))).as("a"),
      Text.charHashHof(lower(col("text"))).as("b")))
  }

  test("PolyHash handles empty string and non-ASCII codepoints") {
    import spark.implicits._
    val df = Seq("", "héllo wörld", "汉字 text", "a b  c").toDF("s")
    assertNoDiff(df.select(Text.charHash(col("s")).as("a"),
      Text.charHashHof(col("s")).as("b")))
  }

  test("ShingleHashes == HOF shingles on every document (n=3 and n=2)") {
    val toks = Text.tokens(col("text"))
    Seq(2, 3).foreach { n =>
      assertNoDiff(docs.select(
        MinHashLSH.shingleHashes(toks, n).as("a"),
        MinHashLSH.shingleHashesHof(toks, n).as("b")))
    }
  }

  test("ShingleHashes short-document fallback (fewer tokens than n)") {
    import spark.implicits._
    val df = Seq("one two", "single").toDF("text")
    val toks = Text.tokens(col("text"))
    assertNoDiff(df.select(MinHashLSH.shingleHashes(toks, 3).as("a"),
      MinHashLSH.shingleHashesHof(toks, 3).as("b")))
  }

  test("MinHashSignature == HOF signature on every document") {
    val sh = MinHashLSH.shingleHashes(Text.tokens(col("text")), 3)
    assertNoDiff(docs.select(MinHashLSH.signature(sh).as("a"),
      MinHashLSH.signatureHof(sh).as("b")))
  }

  test("VocabHits == HOF vocabHits for every language list") {
    val toks = Text.tokens(col("text"))
    Seq(Text.StopEn, Text.StopDe, Text.StopFr, Text.StopEs).foreach { v =>
      assertNoDiff(docs.select(Text.vocabHits(toks, v).as("a"),
        Text.vocabHitsHof(toks, v).as("b")))
    }
  }

  test("DotProduct == HOF dot on every embedding pair sample") {
    val e = embs.select(col("vec_id"), col("embedding"))
    val pairs = e.as("x").join(e.as("y"),
      col("x.vec_id") % 17 === col("y.vec_id") % 17)
    assertNoDiff(pairs.select(
      Vectors.dot(col("x.embedding"), col("y.embedding")).as("a"),
      Vectors.dotHof(col("x.embedding"), col("y.embedding")).as("b")))
  }

  test("SimHash == interpreted bit formula on every document") {
    val hs = transform(Text.tokens(col("text")),
      s => (Text.charHash(s) * lit(2654435761L)) % lit(4294967296L))
    assertNoDiff(docs
      .select(hs.as("hs"))
      .select(NativeKernels.simhash(col("hs"), 32).as("a"),
        expr("""aggregate(sequence(0, 31), 0L, (acc, i) -> acc +
          |  IF(aggregate(hs, 0L, (x, h) ->
          |       x + IF((h div shiftleft(1L, i)) % 2 = 1, 1L, -1L)) > 0,
          |     shiftleft(1L, i), 0L))""".stripMargin).as("b")))
  }

  test("DotProduct propagates null ELEMENTS like the HOF reference") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f),
        Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Array[java.lang.Float](1.0f, 2.0f),
        Array[java.lang.Float](3.0f, 4.0f))
    ).toDF("a", "b")
    val rows = df.select(
      Vectors.dot(col("a"), col("b")).as("k"),
      Vectors.dotHof(col("a"), col("b")).as("h")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getDouble(0) === 11.0 && rows(1).getDouble(1) === 11.0)
  }

  test("DotProduct returns NULL for mismatched lengths like the HOF reference") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f)), // |a| > |b|
      (Array(1.0f), Array(2.0f, 3.0f)), // |a| < |b|
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)) // equal — control
    ).toDF("a", "b")
    val rows = df.select(
      Vectors.dot(col("a"), col("b")).as("k"),
      Vectors.dotHof(col("a"), col("b")).as("h")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) === 11.0 && rows(2).getDouble(1) === 11.0)
  }

  test("null token elements match HOF semantics in every text kernel") {
    import spark.implicits._
    val df = Seq(Tuple1(Array[String]("the", null, "agg", "table")))
      .toDF("toks")
    // VocabHits: nulls never match (filter drops them)
    assertNoDiff(df.select(Text.vocabHits(col("toks"), Text.StopEn).as("a"),
      Text.vocabHitsHof(col("toks"), Text.StopEn).as("b")))
    // ShingleHashes: nulls skipped inside each shingle (array_join skip)
    assertNoDiff(df.select(
      MinHashLSH.shingleHashes(col("toks"), 3).as("a"),
      MinHashLSH.shingleHashesHof(col("toks"), 3).as("b")))
    // SimHash: a null hash element behaves as hash 0 — in the HOF
    // reference IF(null-condition, 1, -1) takes the else branch
    val hs = Seq(Tuple1(Array[java.lang.Long](5L, null, 9L))).toDF("hs")
    assertNoDiff(hs.select(NativeKernels.simhash(col("hs"), 32).as("a"),
      expr("""aggregate(sequence(0, 31), 0L, (acc, i) -> acc +
        |  IF(aggregate(hs, 0L, (x, h) ->
        |       x + IF((h div shiftleft(1L, i)) % 2 = 1, 1L, -1L)) > 0,
        |     shiftleft(1L, i), 0L))""".stripMargin).as("b")))
  }

  // --- SQ8 kernels: the HOF references replay the exact arithmetic
  // ORDER of SqEncode/SqL2Distance (subtract, ·255, divide by the
  // double range, HALF_UP round, clamp; left fold for the distance) —
  // the same order the DuckDB oracle uses.

  private def sqStats = {
    val s = graft.operators.ScalarQuantizer.train(
      embs.select(col("embedding")), "embedding")
    (s.lo, s.range)
  }

  private def encodeHof(vec: org.apache.spark.sql.Column, lo: Seq[Double],
      rg: Seq[Double]): org.apache.spark.sql.Column = {
    val loA = array(lo.map(lit): _*)
    val rgA = array(rg.map(lit): _*)
    transform(vec, (x, i) => {
      val l = element_at(loA, i + 1)
      val r = element_at(rgA, i + 1)
      when(r <= 0.0, lit(0)).otherwise(
        greatest(lit(0.0), least(lit(255.0),
          round(((x.cast("double") - l) * lit(255.0)) / r))).cast("int"))
    })
  }

  private def distHof(q: org.apache.spark.sql.Column,
      codes: org.apache.spark.sql.Column, lo: Seq[Double],
      rg: Seq[Double]): org.apache.spark.sql.Column = {
    val loA = array(lo.map(lit): _*)
    val rgA = array(rg.map(lit): _*)
    aggregate(sequence(lit(0), lit(lo.length - 1)), lit(0.0), (acc, i) => {
      val xhat = element_at(loA, i + 1) +
        (element_at(codes, i + 1).cast("double") * element_at(rgA, i + 1)) /
          lit(255.0)
      val d = element_at(q, i + 1).cast("double") - xhat
      acc + d * d
    })
  }

  test("SqEncode == HOF encode on every embedding (incl. out-of-range)") {
    val (lo, rg) = sqStats
    // in-range corpus rows AND a +0.5-shifted copy (every dimension past
    // its trained hi — the clamp/saturation path)
    val shifted = embs.select(transform(col("embedding"),
      x => (x.cast("double") + lit(0.5)).cast("float")).as("embedding"))
    Seq(embs.select(col("embedding")), shifted).foreach { df =>
      assertNoDiff(df.select(
        NativeKernels.sqEncode(col("embedding"), lo, rg).as("a"),
        encodeHof(col("embedding"), lo, rg).as("b")))
    }
  }

  test("SqEncode degenerate dimension encodes to 0 in both paths") {
    import spark.implicits._
    val df = Seq(Array(1.5f, -2.0f)).toDF("v")
    val lo = Seq(1.5, -3.0); val rg = Seq(0.0, 2.0)
    assertNoDiff(df.select(NativeKernels.sqEncode(col("v"), lo, rg).as("a"),
      encodeHof(col("v"), lo, rg).as("b")))
    val codes = df.select(NativeKernels.sqEncode(col("v"), lo, rg))
      .head.getSeq[Int](0)
    assert(codes.head === 0)
  }

  test("SqL2Distance == HOF fused decode+distance on embedding pair sample") {
    val (lo, rg) = sqStats
    val enc = embs.select(col("vec_id"),
      NativeKernels.sqEncode(col("embedding"), lo, rg).as("codes"))
    val pairs = embs.select(col("vec_id"), col("embedding")).as("x")
      .join(enc.as("y"), col("x.vec_id") % 17 === col("y.vec_id") % 17)
    assertNoDiff(pairs.select(
      NativeKernels.sqL2Distance(col("x.embedding"), col("y.codes"),
        lo, rg).as("a"),
      distHof(col("x.embedding"), col("y.codes"), lo, rg).as("b")))
  }

  test("SQ kernels null on dimension mismatch and null elements") {
    import spark.implicits._
    val lo = Seq(0.0, 0.0); val rg = Seq(1.0, 1.0)
    val mism = Seq(Array(1.0f, 2.0f, 3.0f)).toDF("v")
    assert(mism.select(NativeKernels.sqEncode(col("v"), lo, rg))
      .head.isNullAt(0), "dim mismatch with trained stats must null the row")
    val nullEl = Seq(Tuple1(Array[java.lang.Float](1.0f, null)))
      .toDF("v")
    assert(nullEl.select(NativeKernels.sqEncode(col("v"), lo, rg))
      .head.isNullAt(0))
    val d = Seq((Array(1.0f, 2.0f), Array(1, 2, 3))).toDF("q", "c")
    assert(d.select(NativeKernels.sqL2Distance(col("q"), col("c"), lo, rg))
      .head.isNullAt(0))
  }

  test("kernels survive null inputs") {
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("s")
    assert(df.select(Text.charHash(col("s"))).collect().head.isNullAt(0))
    val dfa = Seq(Option.empty[Array[Float]]).toDF("v")
    assert(dfa.select(Vectors.dot(col("v"), col("v"))).collect().head.isNullAt(0))
  }
}
