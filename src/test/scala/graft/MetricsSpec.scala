package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class MetricsSpec extends SparkTestBase {

  test("a broadcast join moves zero shuffle bytes; a groupBy shuffles") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")

    // noop sink: a count() would add its own tiny partial-agg exchange,
    // polluting the zero-shuffle assertion
    val bcast = Metrics.measure(spark) {
      lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .write.mode("overwrite").format("noop").save()
    }
    assert(bcast.inputBytes > 0 && bcast.inputRecords > 0)
    assert(bcast.shuffleWriteBytes == 0, bcast.pretty)

    val grouped = Metrics.measure(spark) {
      lineitem.groupBy("l_partkey").agg(sum("l_quantity"))
        .write.mode("overwrite").format("noop").save()
    }
    assert(grouped.shuffleWriteBytes > 0, grouped.pretty)
    // map-side partial aggregation: the shuffle carries one row per
    // (mapper, key), strictly less than the raw scan moved whole
    assert(grouped.shuffleWriteBytes < grouped.inputBytes, grouped.pretty)
  }

  test("metrics isolate per measurement (listener removed after each)") {
    val a = Metrics.measure(spark) {
      Tables.load(spark, sfDir, "region").count()
    }
    val b = Metrics.measure(spark) { /* no spark work */ }
    assert(a.inputRecords > 0)
    assert(b.inputRecords == 0 && b.shuffleWriteBytes == 0, b.pretty)
  }
}
