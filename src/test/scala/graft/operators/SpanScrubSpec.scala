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
}
