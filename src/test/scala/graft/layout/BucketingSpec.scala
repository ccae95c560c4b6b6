package graft.layout

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {

  test("joining two same-bucketed tables plans no shuffle exchange") {
    import spark.implicits._
    val facts = (1 to 10000).map(i => (i % 500, s"f$i")).toDF("k", "payload")
    val dims = (0 until 500).map(i => (i, s"d$i")).toDF("k", "attr")
    Bucketing.writeBucketed(facts, "bkt_facts", "k", 8)
    Bucketing.writeBucketed(dims, "bkt_dims", "k", 8)
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_facts", "bkt_dims", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free bucketed join, got:\n$plan")
      assert(joined.count() === 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }
}
