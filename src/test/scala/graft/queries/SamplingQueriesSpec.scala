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
    val ranked = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        (size(array_distinct(toks)).cast("double")
          / greatest(size(toks), lit(1))).as("diversity"))
      .withColumn("run_tokens",
        sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("source"))
            .orderBy(col("diversity").desc, col("doc_id"))
            .rowsBetween(Long.MinValue, 0)))
      .collect()
      .groupBy(_.getString(0))
    val selected = SamplingQueries.tokenBudgetSelect.run(spark, sfDir)
      .collect().groupBy(_.getString(0))
    ranked.foreach { case (source, rows) =>
      val walk = rows.sortBy(_.getLong(4))
      val prefix = walk.takeWhile(_.getLong(4) <= budget)
      val got = selected.getOrElse(source, Array.empty).map(_.getLong(1)).sorted
      assert(got.toSeq === prefix.map(_.getLong(1)).sorted.toSeq, source)
      // maximality: the first unselected doc (if any) would bust the budget
      walk.drop(prefix.length).headOption.foreach { next =>
        assert(next.getLong(4) > budget, s"$source not maximal")
      }
    }
  }
}
