package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Text

/** Semantic properties of the curation tier the oracle's hash equality
  * doesn't state directly: the stratified sample preserves composition
  * (per-stratum cap, no stratum invented or lost), and the token-budget
  * selection is the MAXIMAL quality-ordered prefix under the budget —
  * greedy, not just "some subset that fits".
  */
class SamplingQueriesSpec extends SparkTestBase {

  test("stratified sample: ≤ k docs per stratum, every nonempty stratum kept") {
    val sample = SamplingQueries.stratifiedSample.run(spark, sfDir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    assert(sample.filter(col("n") > 3).count() === 0)
    // a stratum with any documents must appear in the sample (k ≥ 1)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("source")).distinct()
    assert(docs.join(sample, Seq("lang", "source"), "left_anti").count() === 0)
    // sampling is deterministic: same input, same pick
    val again = SamplingQueries.stratifiedSample.run(spark, sfDir)
    assert(SamplingQueries.stratifiedSample.run(spark, sfDir).collect()
      .map(_.toString).toSeq === again.collect().map(_.toString).toSeq)
  }

  test("token budget: selection is the maximal quality-ordered prefix per source") {
    val budget = 800L
    val toks = Text.tokens(col("text"))
    // per-doc facts only — the walk, cumsum, and cutoff are re-derived
    // in plain Scala below, INDEPENDENT of the window the production
    // query uses (a shared window would make this check circular)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (size(array_distinct(toks)).cast("double")
          / greatest(size(toks), lit(1))).as("diversity"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val selected = SamplingQueries.tokenBudgetSelect.run(spark, sfDir)
      .collect().groupBy(_.getString(0))
    docs.foreach { case (source, rows) =>
      // quality walk: diversity desc, doc_id asc; greedy inclusive cumsum
      val walk = rows.sortBy { case (_, id, _, div) => (-div, id) }
      var running = 0L
      val expected = walk.takeWhile { case (_, _, n, _) =>
        running += n; running <= budget
      }.map(_._2)
      val got = selected.getOrElse(source, Array.empty).map(_.getLong(1))
      assert(got.sorted.toSeq === expected.sorted.toSeq, source)
      // maximality against the independent cumsum: adding the next doc
      // in the walk (if any) must exceed the budget
      if (expected.length < walk.length) {
        val spent = walk.take(expected.length).map(_._3).sum
        assert(spent + walk(expected.length)._3 > budget,
          s"$source not maximal: $spent spent of $budget")
      }
    }
  }
}
