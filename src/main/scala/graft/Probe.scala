package graft
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe")
    val li = sources.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .select("l_extendedprice")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    li.count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val qs = Seq(0.5, 0.9, 0.99)
    time("hist warm")(operators.Sketches.histQuantiles(
      operators.Sketches.histBuild(li, "l_extendedprice", 1024), 1024, qs).count())
    time("hist again")(operators.Sketches.histQuantiles(
      operators.Sketches.histBuild(li, "l_extendedprice", 1024), 1024, qs).count())
    time("exact percentile")(li.agg(expr("percentile(l_extendedprice, array(0.5,0.9,0.99))")).collect())
    time("exact percentile again")(li.agg(expr("percentile(l_extendedprice, array(0.5,0.9,0.99))")).collect())
    spark.stop()
  }
}
