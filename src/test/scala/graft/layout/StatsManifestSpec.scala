package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The q115 I/O claim the oracle result alone can't prove: a range
  * predicate through [[StatsManifest.readPruned]] touches a strictly
  * smaller FILE SET than the full table, loses no qualifying rows, and
  * an out-of-range window reads nothing.
  */
class StatsManifestSpec extends SparkTestBase {

  test("pruned read touches only intersecting files and loses no rows") {
    withTempDir("graft_stats_manifest") { root =>
      val path = s"$root/li"
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"))
      StatsManifest.write(li, path, Seq("l_extendedprice"), targetFiles = 8)

      val all = spark.read.parquet(path)
      val allFiles = all.select(input_file_name()).distinct().count()
      assert(allFiles >= 6, s"expected ~8 files, got $allFiles")

      val (lo, hi) = (1000.0, 2000.0)
      val pruned = StatsManifest.readPruned(spark, path,
        "l_extendedprice", lo, hi)
      val prunedFiles = pruned.select(input_file_name()).distinct().count()
      assert(prunedFiles < allFiles,
        s"no pruning: $prunedFiles of $allFiles files read")

      // superset contract: exact predicate on top of the pruned read
      // equals the full-scan answer
      def answer(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
        df.filter(col("l_extendedprice") >= lo &&
            col("l_extendedprice") <= hi)
          .select(col("l_orderkey"), col("l_extendedprice"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
      assert(answer(pruned) === answer(all))
      assert(answer(pruned).nonEmpty)

      // a window outside the value domain selects no files and yields an
      // empty (schema-preserving) frame
      val none = StatsManifest.readPruned(spark, path,
        "l_extendedprice", -2.0, -1.0)
      assert(none.count() === 0)
      assert(none.schema.fieldNames.toSeq ===
        Seq("l_orderkey", "l_extendedprice"))
    }
  }

  test("manifest rows carry one entry per data file with tight windows") {
    withTempDir("graft_stats_manifest2") { root =>
      val path = s"$root/li"
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"))
      StatsManifest.write(li, path, Seq("l_extendedprice"), targetFiles = 4)
      val m = spark.read.parquet(s"$path/${StatsManifest.StatsDir}")
      val files = spark.read.parquet(path)
        .select(input_file_name()).distinct().count()
      assert(m.count() === files)
      // range clustering ⇒ per-file windows are disjoint up to touching
      // edges: sorted by min, each file's max ≤ next file's min
      val wins = m.select(col("min_l_extendedprice"),
          col("max_l_extendedprice"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
        .sortBy(_._1)
      wins.foreach { case (mn, mx) => assert(mn <= mx) }
      wins.sliding(2).foreach {
        case Array((_, mx1), (mn2, _)) => assert(mx1 <= mn2)
        case _ =>
      }
      // the manifest itself is invisible to a plain directory scan
      assert(spark.read.parquet(path).columns.toSeq ===
        Seq("l_orderkey", "l_extendedprice"))
    }
  }
}
