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

  test("kernels survive null inputs") {
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("s")
    assert(df.select(Text.charHash(col("s"))).collect().head.isNullAt(0))
    val dfa = Seq(Option.empty[Array[Float]]).toDF("v")
    assert(dfa.select(Vectors.dot(col("v"), col("v"))).collect().head.isNullAt(0))
  }
}
