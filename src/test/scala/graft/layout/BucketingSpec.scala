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

  test("writeBucketedBySwap never leaves the table missing; recoverSwap " +
      "promotes a staged generation stranded mid-rename") {
    import spark.implicits._
    val t = "bkt_swap_spec"
    try {
      Bucketing.writeBucketed((1 to 10).map(i => (i, "g1"))
        .toDF("k", "gen"), t, "k", 4)
      // normal swap: fold the current generation into its replacement
      Bucketing.writeBucketedBySwap(
        spark.table(t).withColumn("gen", org.apache.spark.sql.functions
          .lit("g2")), t, Seq("k"), 4)
      assert(spark.table(t).count() === 10L)
      assert(spark.table(t).select("gen").distinct().head.getString(0)
        === "g2")
      assert(!spark.catalog.tableExists(t + "__staged")
        && !spark.catalog.tableExists(t + "__old"),
        "the swap must clean up its intermediate tables")
      // crash in the middle window: the new generation is fully staged
      // and the current one has been renamed away — `t` does not exist.
      // (drop-then-rename used to have this exact window with NOTHING
      // staged-complete to recover from)
      Bucketing.writeBucketedBy(
        spark.table(t).withColumn("gen", org.apache.spark.sql.functions
          .lit("g3")), t + "__staged", Seq("k"), 4)
      spark.sql(s"ALTER TABLE `$t` RENAME TO `${t}__old`")
      assert(!spark.catalog.tableExists(t))
      Bucketing.recoverSwap(spark, t)
      assert(spark.catalog.tableExists(t), "staged generation not promoted")
      assert(spark.table(t).select("gen").distinct().head.getString(0)
        === "g3", "recovery must serve the STAGED (complete, newest) gen")
      assert(!spark.catalog.tableExists(t + "__staged")
        && !spark.catalog.tableExists(t + "__old"),
        "recovery must clear the superseded generations")
      // idempotent when nothing is wrong
      Bucketing.recoverSwap(spark, t)
      assert(spark.table(t).count() === 10L)
    } finally {
      Seq(t, t + "__staged", t + "__old")
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
    }
  }
}
