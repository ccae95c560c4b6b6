package graft.operators

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {

  test("salted join returns exactly the unsalted join's result on skew") {
    import spark.implicits._
    // power-law left: one hot key with 5k rows, a long tail
    val left = ((1 to 5000).map(i => ("hot", i)) ++
      (1 to 100).map(i => (s"k$i", i))).toDF("k", "row_id")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "attr")

    val plain = left.join(right, "k")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", "row_id", 8)
    assert(salted.count() === plain.count())
    assert(salted.select("k", "row_id", "attr").collect().toSet ===
      plain.select("k", "row_id", "attr").collect().toSet)
  }

  test("hot-key rows spread across salt buckets before the join") {
    import spark.implicits._
    val left = (1 to 1000).map(i => ("hot", i)).toDF("k", "row_id")
    val buckets = left
      .withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(
            org.apache.spark.sql.functions.col("row_id")),
          org.apache.spark.sql.functions.lit(8)))
      .groupBy("__salt").count().collect()
    assert(buckets.length === 8) // every salt value used
    assert(buckets.map(_.getLong(1)).max < 1000) // no bucket holds all rows
  }
}
