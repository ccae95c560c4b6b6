package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Reference edge rules (SURVEY.md §5a): risk band edges at 4/5/6/7,
  * depth buckets at 70/300, tsunami conjunction, plus ScalaCheck
  * monotonicity of the energy/intensity formulas in magnitude.
  */
class PhysicsSpec extends SparkTestBase {
  import spark.implicits._

  private def evalPhysics(rows: Seq[(Double, Double)]) =
    rows.toDF("mag", "depth").select(
      col("mag"), col("depth"),
      Physics.riskLevel(col("mag")).as("risk"),
      Physics.depthCategory(col("depth")).as("cat"),
      Physics.tsunamiPotential(col("mag"), col("depth")).as("tsunami"),
      Physics.energyJoulesLog(col("mag")).as("elog"),
      Physics.mercalliIntensity(col("mag"), col("depth")).as("mmi"))

  test("risk band edges are inclusive at 4/5/6/7") {
    val out = evalPhysics(Seq((3.999, 0.0), (4.0, 0.0), (5.0, 0.0),
      (6.0, 0.0), (7.0, 0.0)))
      .select("mag", "risk").collect().map(r => r.getDouble(0) -> r.getString(1))
    assert(out.toMap === Map(3.999 -> "MINIMAL", 4.0 -> "LOW",
      5.0 -> "MODERATE", 6.0 -> "HIGH", 7.0 -> "CRITICAL"))
  }

  test("depth buckets split at 70 and 300 (exclusive upper)") {
    val out = evalPhysics(Seq((5.0, 69.999), (5.0, 70.0), (5.0, 299.999),
      (5.0, 300.0)))
      .select("depth", "cat").collect().map(r => r.getDouble(0) -> r.getString(1))
    assert(out.toMap === Map(69.999 -> "SHALLOW", 70.0 -> "INTERMEDIATE",
      299.999 -> "INTERMEDIATE", 300.0 -> "DEEP"))
  }

  test("tsunami potential requires BOTH mag >= 7 and depth < 70") {
    val out = evalPhysics(Seq((7.0, 69.9), (7.0, 70.0), (6.9, 10.0)))
      .select("mag", "depth", "tsunami").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    assert(out === Map((7.0, 69.9) -> true, (7.0, 70.0) -> false,
      (6.9, 10.0) -> false))
  }

  test("energy and intensity are monotone non-decreasing in magnitude") {
    // dense grid property check: for fixed depth, higher magnitude never
    // yields lower energy/intensity (one Spark job, not one per sample)
    val rng = new scala.util.Random(42)
    val grid = for {
      d <- Seq(0.0, 10.0, 69.9, 70.0, 300.0, 700.0)
      m <- (0 to 200).map(_ => rng.nextDouble() * 9.0)
    } yield (m, d)
    val rows = evalPhysics(grid)
      .select("depth", "mag", "elog", "mmi").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    rows.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 <= b._3, s"energy not monotone: $a -> $b")
          assert(a._4 <= b._4, s"mmi not monotone: $a -> $b")
        case _ =>
      }
    }
  }

  test("null magnitude propagates (no sentinel invention)") {
    val df = Seq(Option.empty[Double]).toDF("mag")
    assert(df.select(Physics.energyJoules(col("mag"))).collect().head.isNullAt(0))
  }
}
