package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TemperatureMixSpec extends SparkTestBase {
  import spark.implicits._

  // three sources with 10:4:1 token mass
  private def docs = Seq.concat(
    (1 to 100).map(i => ("big", 10L)),
    (1 to 40).map(i => ("mid", 10L)),
    (1 to 10).map(i => ("small", 10L))).toDF("source", "n_tokens")

  private def run(alpha: Double) =
    TemperatureMix.plan(docs, "source", "n_tokens", alpha,
        budget = col("total_tokens"))
      .select(col("source"), col("natural_share"), col("temp_share"),
        col("target_tokens"), col("epochs"))
      .as[(String, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("alpha=1 keeps natural proportions; alpha=0 equalizes sources") {
    run(1.0).values.foreach { case (s, nat, temp, _, _) =>
      assert(math.abs(temp - nat) <= 1e-4, s"$s: $temp != $nat at alpha=1")
    }
    run(0.0).values.foreach { case (s, _, temp, _, _) =>
      assert(math.abs(temp - 1.0 / 3) <= 1e-4, s"$s: $temp at alpha=0")
    }
  }

  test("alpha=0.5 flattens: big source loses share, small gains epochs>1") {
    val m = run(0.5)
    assert(m("big")._3 < m("big")._2, "big source should lose share")
    assert(m("small")._3 > m("small")._2, "small source should gain share")
    // the small source repeats (epochs > 1); the big one subsamples
    assert(m("small")._5 > 1.0 && m("big")._5 < 1.0)
  }

  test("target allocations re-spend the budget within per-source rounding") {
    val total = 1500L // 150 docs x 10 tokens
    val sumTargets = run(0.5).values.map(_._4).sum
    assert(math.abs(sumTargets - total) <= 3, s"sum $sumTargets vs $total")
  }

  test("materialize realizes each source's target within one document") {
    // varying token counts so the greedy prefix boundary is non-trivial
    val d = Seq.concat(
      (1 to 100).map(i => ("big", i.toLong, 10L + (i % 7))),
      (1 to 40).map(i => ("mid", 1000L + i, 8L + (i % 5))),
      (1 to 10).map(i => ("small", 2000L + i, 12L)))
      .toDF("source", "doc_id", "n_tokens")
    val targets = TemperatureMix.plan(d, "source", "n_tokens", 0.5,
        budget = col("total_tokens"))
      .select(col("source"), col("target_tokens"))
      .as[(String, Long)].collect().toMap
    val realized = TemperatureMix.materialize(d, "source", "doc_id",
        "n_tokens", 0.5, budget = col("total_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_copies") * col("n_tokens")).as("r"))
      .as[(String, Long)].collect().toMap
    val maxDoc = 16L // largest per-doc token count in the fixture
    targets.foreach { case (s, target) =>
      val r = realized.getOrElse(s, 0L)
      // full epochs hit the target floor exactly; the greedy prefix
      // overshoots by strictly less than one document
      assert(r >= target && r < target + maxDoc,
        s"$s realized $r vs target $target")
    }
    spark.catalog.clearCache()
  }
}
