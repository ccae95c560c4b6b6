package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The property Stable exists for: rounded aggregates are bit-identical
  * no matter how the input is partitioned (shuffle merge order is
  * nondeterministic, so plain double sums are not).
  */
class StableSpec extends SparkTestBase {

  test("avg4/sum2 are identical across partitionings") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
    def agg(parts: Int) =
      ev.repartition(parts)
        .groupBy(col("event_type"))
        .agg(Stable.avg4(col("value")).as("a"),
          Stable.sum2(col("value")).as("s"))
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
    val one = agg(1)
    assert(agg(7) === one)
    assert(agg(32) === one)
  }

  test("avg4 ignores nulls like avg (count of non-nulls, not rows)") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(2.0)).toDF("v")
    val Array(row) = df.agg(Stable.avg4(col("v"))).collect()
    assert(row.getDouble(0) === 1.5)
  }

  test("empty input yields NULL, matching avg/sum semantics") {
    import spark.implicits._
    val df = Seq.empty[Double].toDF("v")
    val Array(row) = df.agg(Stable.avg4(col("v")), Stable.sum2(col("v"))).collect()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
