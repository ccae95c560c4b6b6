package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Expectations.Rule
import graft.sources.Snapshots

class WapSpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    Rule("v_positive", col("v") > 0),
    Rule("k_present", col("k").isNotNull))

  test("refused batch publishes NO version and leaves served state " +
      "untouched") {
    withTempDir("wap") { dir =>
      val path = s"$dir/t"
      val v0 = Snapshots.write(Seq(("a", 1), ("b", 2)).toDF("k", "v"), path)
      val out = Wap.publishOrRefuse(spark, path,
        Seq(("c", 3), ("d", -4)).toDF("k", "v"), rules)
      assert(out.published.isEmpty && out.violations === 1L)
      assert(Snapshots.latestVersion(spark, path) === Some(v0))
      assert(Snapshots.read(spark, path).count() === 2L)
      graft.CacheScope.releaseAll()
    }
  }

  test("clean batch publishes current ∪ batch as the next version") {
    withTempDir("wap") { dir =>
      val path = s"$dir/t"
      Snapshots.write(Seq(("a", 1)).toDF("k", "v"), path)
      val out = Wap.publishOrRefuse(spark, path,
        Seq(("b", 2), ("c", 3)).toDF("k", "v"), rules)
      assert(out.violations === 0L)
      assert(Snapshots.read(spark, path).count() === 3L)
      graft.CacheScope.releaseAll()
    }
  }

  test("drop-mode publishes clean rows and quarantines violators with " +
      "their failed rules") {
    withTempDir("wap") { dir =>
      val path = s"$dir/t"
      Snapshots.write(Seq(("a", 1)).toDF("k", "v"), path)
      val (v, bad) = Wap.publishDropping(spark, path,
        Seq(("b", 2), ("c", -3), (null, -9)).toDF("k", "v"), rules)
      assert(Snapshots.latestVersion(spark, path) === Some(v))
      assert(Snapshots.read(spark, path).collect().map(_.getString(0))
        .toSet === Set("a", "b"))
      val q = bad.orderBy(col("v").desc).collect()
      assert(q.map(_.getSeq[String](
          q.head.fieldIndex("failed_expectations")).toList).toList ===
        List(List("v_positive"), List("v_positive", "k_present")))
      graft.CacheScope.releaseAll()
    }
  }
}
