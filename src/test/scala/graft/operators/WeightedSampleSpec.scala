package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WeightedSampleSpec extends SparkTestBase {

  test("min-ticket key is pointwise monotone in weight (prefix property)") {
    // the w-ticket set is a prefix of the (w+k)-ticket set, so adding
    // weight can only LOWER a row's key — the guarantee that makes
    // weights honest (more quality never hurts selection)
    val ids = spark.range(500).select(col("id"))
    val keys = ids.select(
        WeightedSample.minTicket(col("id"), lit(1)).as("k1"),
        WeightedSample.minTicket(col("id"), lit(3)).as("k3"),
        WeightedSample.minTicket(col("id"), lit(5)).as("k5"))
      .collect()
    keys.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), r.toString) // k3 <= k1
      assert(r.getLong(2) <= r.getLong(1), r.toString) // k5 <= k3
    }
    // and it is not vacuous: weight actually changes some keys
    assert(keys.count(r => r.getLong(2) < r.getLong(0)) > 100)
  }

  test("sample is deterministic under repartitioning and weight-sensitive") {
    val base = spark.range(1000).select(col("id"),
      (col("id") % 4 + 1).cast("int").as("w"),
      (col("id") % 3).cast("string").as("src"))
    val a = WeightedSample.sample(base, Seq("src"), "id", "w", 25)
      .select("src", "id", "ticket").collect().map(_.toString).sorted.toSeq
    val b = WeightedSample.sample(base.repartition(13), Seq("src"), "id", "w", 25)
      .select("src", "id", "ticket").collect().map(_.toString).sorted.toSeq
    assert(a === b)
    assert(a.size === 75) // 3 strata x 25

    // weight sensitivity: among winners, high weights are overrepresented
    // relative to their 1/4 population share (each stratum's weights are
    // uniform over {1,2,3,4} by construction)
    val winners = WeightedSample.sample(base, Seq("src"), "id", "w", 25)
      .groupBy(col("w")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(winners.getOrElse(4, 0L) > winners.getOrElse(1, 0L),
      winners.toString)
  }

  test("weight below 1 means no tickets: never sampled, key is null") {
    val base = spark.range(100).select(col("id"),
      when(col("id") < 50, 0).otherwise(1).cast("int").as("w"),
      lit("s").as("src"))
    val ks = base.select(col("id"),
        WeightedSample.minTicket(col("id"), col("w")).as("k"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert((0L until 50L).forall(ks(_)), "w=0 rows must have null keys")
    assert((50L until 100L).forall(!ks(_)))
    // and the sample never admits a ticketless row, even with room
    val picked = WeightedSample.sample(base, Seq("src"), "id", "w", 80)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked.forall(_ >= 50L), s"ticketless row sampled: $picked")
    assert(picked.size === 50)
  }
}
