package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SpanScrubSpec extends SparkTestBase {

  private def toksDf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        split(col("text"), " ").as("toks"))
  }

  test("a span shared by two docs is removed from both, unique text kept") {
    val shared = "one two three four five"
    val df = toksDf(Seq(
      1L -> s"alpha beta $shared gamma",
      2L -> s"$shared delta epsilon zeta"))
    val out = SpanScrub.scrub(df, "doc_id", "toks", n = 5, minDf = 2L)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("n_spans"), array_join(col("cleaned"), " ").as("cleaned"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) === ((8L, 5L, 1L, "alpha beta gamma")))
    assert(out(2L) === ((8L, 5L, 1L, "delta epsilon zeta")))
  }

  test("overlapping hot spans cover the union of their positions") {
    // docs 1 and 2 share a 6-token run => two overlapping hot 5-grams
    // covering 6 positions, counted once each
    val run = "a b c d e f"
    val df = toksDf(Seq(1L -> s"x $run", 2L -> s"$run y"))
    val out = SpanScrub.scrub(df, "doc_id", "toks", n = 5, minDf = 2L)
      .select(col("doc_id"), col("n_removed"), col("n_spans"),
        array_join(col("cleaned"), " ").as("cleaned"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((6L, 2L, "x")))
    assert(out(2L) === ((6L, 2L, "y")))
  }

  test("docs shorter than n and unique docs pass through untouched") {
    val df = toksDf(Seq(
      1L -> "tiny doc", // < n tokens: no spans at all
      2L -> "six unique tokens never repeated anywhere",
      3L -> "six unique tokens never repeated anywhere")) // exact dup of 2
    val out = SpanScrub.scrub(df, "doc_id", "toks", n = 5, minDf = 2L)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        array_join(col("cleaned"), " ").as("cleaned"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 0L, "tiny doc")))
    // exact duplicates scrub to nothing (every position hot)
    assert(out(2L) === ((6L, 6L, "")))
    assert(out(3L) === ((6L, 6L, "")))
  }

  test("minDf above the repeat count disables the scrub") {
    val df = toksDf(Seq(
      1L -> "one two three four five six",
      2L -> "one two three four five six"))
    val out = SpanScrub.scrub(df, "doc_id", "toks", n = 5, minDf = 3L)
    assert(out.agg(sum(col("n_removed"))).head.getLong(0) === 0L)
  }

  /** Brute-force driver-side reference: same hot-span rule, naive. */
  private def refScrub(docs: Seq[(Long, Vector[String])], n: Int,
      minDf: Int): Map[Long, (Long, Long, Long, String)] = {
    val grams = docs.flatMap { case (id, ts) =>
      ts.sliding(n).filter(_.size == n).zipWithIndex
        .map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val hot = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDf)
      .keySet
    docs.map { case (id, ts) =>
      val occ = grams.filter(g => g._1 == id && hot(g._3))
      val cov = occ.flatMap(g => g._2 until (g._2 + n)).toSet
      val cleaned = ts.zipWithIndex.collect {
        case (t, i) if !cov(i) => t
      }
      id -> ((ts.size.toLong, cov.size.toLong, occ.size.toLong,
        cleaned.mkString(" ")))
    }.toMap
  }

  test("random corpora match the brute-force reference exactly") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    (1 to 3).foreach { trial =>
      // small vocabulary + a planted shared run force real hot spans
      val planted = Vector.fill(4)(vocab(rnd.nextInt(vocab.size)))
      val docs = (1L to 12L).map { id =>
        val body = Vector.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        val ts = if (id % 3 == 0) planted ++ body else body
        id -> ts
      }
      val expected = refScrub(docs, n = 3, minDf = 2)
      val df = toksDf(docs.map { case (id, ts) => id -> ts.mkString(" ") })
      val got = SpanScrub.scrub(df, "doc_id", "toks", n = 3, minDf = 2L)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          col("n_spans"), array_join(col("cleaned"), " ").as("cleaned"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(got === expected, s"trial $trial: $docs")
    }
  }

  test("a 5k-token high-coverage doc scrubs exactly (O(L+R) reassembly)") {
    // two docs sharing a 5000-token boilerplate block: every 5-gram
    // fully inside the block is hot, so ~99.8% of each doc's positions
    // are removed — the regime where the old per-token
    // array_contains(removed, ·) reassembly paid O(L·R) ≈ 2.5·10⁷
    // comparisons per doc and the array_except path pays O(L)
    val L = 5000
    val shared = (1 to L).map(i => s"s$i").toVector
    val prefix = (1 to 10).map(i => s"u$i").toVector
    val suffix = (1 to 10).map(i => s"v$i").toVector
    val df = toksDf(Seq(
      1L -> (prefix ++ shared).mkString(" "),
      2L -> (shared ++ suffix).mkString(" ")))
    val out = SpanScrub.scrub(df, "doc_id", "toks", n = 5, minDf = 2L)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("n_spans"), array_join(col("cleaned"), " ").as("cleaned"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // hot 5-grams are exactly those fully inside the shared block
    // (boundary grams mix unique tokens and occur once): L-4 spans
    // covering all L shared positions, unique prefix/suffix survive
    assert(out(1L) === (((L + 10).toLong, L.toLong, (L - 4).toLong,
      prefix.mkString(" "))))
    assert(out(2L) === (((L + 10).toLong, L.toLong, (L - 4).toLong,
      suffix.mkString(" "))))
  }
}
