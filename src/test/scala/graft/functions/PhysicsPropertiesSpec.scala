package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.SparkTestBase

/** ScalaCheck-generated property tests (SURVEY.md §5c): inputs come from
  * generators with a fixed seed, evaluated in ONE Spark job per suite and
  * checked pairwise on the collected rows — properties over the real
  * codegen'd expressions, without a job per sample.
  */
class PhysicsPropertiesSpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g)(Gen.Parameters.default, rng.Seed(42L))
      .getOrElse(sys.error("generator exhausted"))

  private val mags = samples(Gen.chooseNum(-1.0, 11.0), 25)
  private val depths = samples(Gen.chooseNum(0.0, 800.0), 12)

  test("energy/moment/MMI are monotone in magnitude; MMI falls with depth") {
    import spark.implicits._
    val grid = for { m <- mags; d <- depths } yield (m, d)
    val rows = grid.toDF("m", "d")
      .select(col("m"), col("d"),
        Physics.energyJoulesLog(col("m")).as("e"),
        Physics.seismicMomentLog(col("m")).as("mo"),
        Physics.mercalliIntensity(col("m"), col("d")).as("mmi"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // fixed depth: all three measures nondecreasing in m
    rows.groupBy(_._2).values.foreach { g =>
      g.sortBy(_._1).toList.sliding(2).foreach {
        case List((m1, _, e1, mo1, i1), (m2, _, e2, mo2, i2)) =>
          assert(e1 <= e2 && mo1 <= mo2 && i1 <= i2, s"not monotone at $m1->$m2")
        case _ =>
      }
    }
    // fixed magnitude: MMI nonincreasing in depth
    rows.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).toList.sliding(2).foreach {
        case List((_, d1, _, _, i1), (_, d2, _, _, i2)) =>
          assert(i1 >= i2, s"MMI rose with depth at $d1->$d2")
        case _ =>
      }
    }
  }

  test("categorical ladders partition the domain (every row in exactly one band)") {
    import spark.implicits._
    val grid = for { m <- mags; d <- depths } yield (m, d)
    val df = grid.toDF("m", "d")
      .select(col("m"), col("d"),
        Physics.mercalliIntensity(col("m"), col("d")).as("mmi"))
      .select(col("m"), col("mmi"),
        Physics.mercalliScale(col("mmi")).as("scale"),
        Physics.damagePotential(col("mmi")).as("damage"),
        Physics.riskLevel(col("m")).as("risk"))
    val n = grid.size.toLong
    // group counts per label sum back to the row count, no NULL labels
    Seq("scale", "damage", "risk").foreach { c =>
      val counts = df.groupBy(col(c)).count().collect()
      assert(counts.forall(!_.isNullAt(0)), c)
      assert(counts.map(_.getLong(1)).sum === n, c)
    }
    // ladder agrees with a straight Scala re-statement of the bands
    df.collect().foreach { r =>
      val (m, mmi, risk) = (r.getDouble(0), r.getDouble(1), r.getString(4))
      val expected =
        if (m >= 7) "CRITICAL" else if (m >= 6) "HIGH"
        else if (m >= 5) "MODERATE" else if (m >= 4) "LOW" else "MINIMAL"
      assert(risk === expected, s"m=$m")
      assert(r.getString(2).nonEmpty && r.getString(3).nonEmpty, s"mmi=$mmi")
    }
  }

  test("dedup keep-first is idempotent on generated duplicate-heavy data") {
    import spark.implicits._
    // small key space forces collisions; ordering key unique per row
    val keys = samples(Gen.chooseNum(1, 8), 400)
    val rows = keys.zipWithIndex.map { case (k, i) => (k.toLong, i.toLong) }
    val df = rows.toDF("k", "seq")
    val once = graft.operators.Dedup.keepFirst(
      df, Seq("k"), Seq(col("seq").desc))
    val twice = graft.operators.Dedup.keepFirst(
      once, Seq("k"), Seq(col("seq").desc))
    assert(twice.collect().toSet === once.collect().toSet)
    // exactly one survivor per key, and it is the max seq
    val survivors = once.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
    assert(survivors === expected)
  }
}
