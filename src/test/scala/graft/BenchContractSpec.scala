package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.Bench.QueryResult

/** Pins the Bench output contract consumers depend on:
  * `errors` counts flaky (intermittent) queries alongside hard
  * failures, hard failures report -1 in the per-query map, and the
  * bounded-tail degradation drops diagnostic arrays before the
  * per-query map.
  */
class BenchContractSpec extends AnyFunSuite {

  private val base = Seq(
    QueryResult("q01_ok", 1.5, contended = false, flaky = false, inflated = false),
    QueryResult("q02_flaky", 2.0, contended = false, flaky = true, inflated = false),
    QueryResult("q03_dead", Double.PositiveInfinity,
      contended = false, flaky = false, inflated = false),
    QueryResult("q04_slow", 3.25, contended = true, flaky = false, inflated = true))

  test("errors counts hard failures AND intermittent (flaky) queries") {
    val line = Bench.renderLine(base, 3, "sfX", sweepRetried = false)
    assert(line.contains("\"errors\":2"), line)
    assert(line.contains("\"failed\":[\"q03\"]"), line)
    assert(line.contains("\"flaky\":[\"q02\"]"), line)
  }

  test("a hard-failed query reports -1, never a time; total skips it") {
    val line = Bench.renderLine(base, 3, "sfX", sweepRetried = false)
    assert(line.contains("\"q03\":-1"), line)
    assert(line.contains("\"value\":6.75"), line) // 1.5 + 2.0 + 3.25
  }

  test("flag arrays carry short names; sweep_retried only when retried") {
    val plain = Bench.renderLine(base, 3, "sfX", sweepRetried = false)
    assert(plain.contains("\"contended\":[\"q04\"]"), plain)
    assert(plain.contains("\"inflated\":[\"q04\"]"), plain)
    assert(!plain.contains("sweep_retried"), plain)
    val retried = Bench.renderLine(base, 3, "sfX", sweepRetried = true)
    assert(retried.contains("\"sweep_retried\":true"), retried)
  }

  test("flag COUNTS survive every tier; degraded tiers keep first names") {
    // round-11 regression: a >Cap sweep rendered contended/flaky/
    // inflated as [] — a fully contention-poisoned 431 s artifact
    // machine-read as a clean one. Counts must survive degradation.
    val many = (1 to 120).map(i => QueryResult(f"q$i%03d_name", 1.0,
      contended = true, flaky = false, inflated = true))
    val line = Bench.renderLine(many, 3, "sfX", sweepRetried = false)
    assert(line.length <= Bench.Cap, s"line ${line.length} > cap")
    // per-query map survives (feeds next round's inflation check)…
    assert(line.contains("\"q001\":1"), line)
    // …counts are unambiguous even with names capped…
    assert(line.contains("\"contended_n\":120"), line)
    assert(line.contains("\"inflated_n\":120"), line)
    assert(line.contains("\"flaky_n\":0"), line)
    // …and the first few names stay attributable
    assert(line.contains("\"contended\":[\"q001\",\"q002\",\"q003\"]"), line)
    assert(line.contains("flag names capped"), line)
  }

  test("flag counts present on the full (uncapped) line too") {
    val line = Bench.renderLine(base, 3, "sfX", sweepRetried = false)
    assert(line.contains("\"contended_n\":1"), line)
    assert(line.contains("\"flaky_n\":1"), line)
    assert(line.contains("\"inflated_n\":1"), line)
  }

  test("inflation triage rule: ratio AND absolute delta must both trip") {
    // 0.22 s -> 0.34 s is 1.5x but pure GC jitter: not inflated
    assert(!Bench.isInflated(0.34, Some(0.224)))
    // 2x but only +0.5 s absolute: not inflated
    assert(!Bench.isInflated(1.0, Some(0.5)))
    // 2x AND +1.5 s: inflated
    assert(Bench.isInflated(3.0, Some(1.5)))
    // big absolute delta but under the ratio: not inflated
    assert(!Bench.isInflated(11.0, Some(10.0)))
    assert(!Bench.isInflated(Double.PositiveInfinity, Some(1.0)))
    assert(!Bench.isInflated(9.0, None))
  }

  test("round-12 regression: when even the 1 s tier overflows, the slow " +
      "queries keep full detail and the fast ones report a count") {
    // 230-query shape: 200 sub-second + 30 multi-second lifecycle gates
    // (the whole-second tier overflows the cap at this count)
    val fast = (1 to 200).map(i => QueryResult(f"q$i%03d_name", 0.4,
      contended = false, flaky = false, inflated = false))
    val slow = (201 to 230).map(i => QueryResult(f"q$i%03d_name",
      5.678, contended = false, flaky = false, inflated = false))
    val line = Bench.renderLine(fast ++ slow, 3, "/root/testdata/sf0.1",
      sweepRetried = false)
    assert(line.length <= Bench.Cap, s"line ${line.length} > cap")
    assert(!line.contains("\"queries\":{}"), line)
    assert(line.contains("\"q201\":5.7"), line) // slow entry survives
    assert(!line.contains("\"q001\""), line) // fast entry dropped
    assert(line.contains("\"fast_omitted\":200"), line)
  }

  test("last-resort tier (queries omitted) still carries flag counts") {
    // force even the 1s tier over the cap: thousands of queries
    val many = (1 to 2000).map(i => QueryResult(f"q$i%04d_name", 1.0,
      contended = true, flaky = false, inflated = false))
    val line = Bench.renderLine(many, 3, "sfX", sweepRetried = false)
    assert(line.length <= Bench.Cap, s"line ${line.length} > cap")
    assert(line.contains("\"queries\":{}"), line)
    assert(line.contains("\"contended_n\":2000"), line)
  }

  test("round-8 regression: ~140 ms-precision queries keep the map by " +
      "rounding, never by dropping it") {
    // the exact shape that committed queries:{} in round 8 — too many
    // queries for the ms tier even with flag names gone
    val many = (1 to 140).map(i => QueryResult(f"q$i%03d_name", 1.234,
      contended = false, flaky = false, inflated = false))
    val line = Bench.renderLine(many, 3, "/root/testdata/sf0.1",
      sweepRetried = false)
    assert(line.length <= Bench.Cap, s"line ${line.length} > cap")
    assert(!line.contains("\"queries\":{}"), line)
    assert(line.contains("times rounded"), line)
    // a rounded tier kept the entry (1.23 at 10ms, 1.2 at 100ms)
    assert(line.contains("\"q001\":1.2"), line)
  }

  test("round-10 regression: ~170 sub-10s queries keep the map at the " +
      "whole-second tier, never by dropping it") {
    // the shape that overflowed round 10's gate sweep: 161 queries whose
    // 100 ms-rounded times (x.y) still blew the cap
    val many = (1 to 170).map(i => QueryResult(f"q$i%03d_name", 3.456,
      contended = false, flaky = false, inflated = false))
    val line = Bench.renderLine(many, 3, "/root/testdata/sf0.1",
      sweepRetried = false)
    assert(line.length <= Bench.Cap, s"line ${line.length} > cap")
    assert(!line.contains("\"queries\":{}"), line)
    assert(line.contains("rounded to 1s"), line)
    assert(line.contains("\"q001\":3"), line)
  }

  test("adaptive repetition: extra runs scale down with observed cost") {
    val B = Bench.DefaultBudgetSec
    // sub-second queries keep min-of-3 post-warm-up (GC/JIT jitter)
    assert(Bench.extraRuns(0.3, 0.0, B) == 3)
    // 1-2 s index ops: min-of-2
    assert(Bench.extraRuns(1.5, 0.0, B) == 2)
    // multi-second lifecycle builds: one confirmation run — never zero
    // under an intact budget (a first run carries JIT even at 6-8 s,
    // and these queries dominate the total)
    assert(Bench.extraRuns(3.5, 0.0, B) == 1)
    assert(Bench.extraRuns(9.0, 0.0, B) == 1)
    // a warm-up that threw gets exactly one retry (flaky vs dead)
    assert(Bench.extraRuns(Double.PositiveInfinity, 0.0, B) == 1)
  }

  test("budget degradation: repetition drains to zero before overrun") {
    val B = Bench.DefaultBudgetSec
    assert(Bench.extraRuns(0.3, 0.61 * B, B) == 2)
    assert(Bench.extraRuns(0.3, 0.86 * B, B) == 1)
    assert(Bench.extraRuns(0.3, 1.01 * B, B) == 0)
    // budget exhaustion overrides even the flaky retry
    assert(Bench.extraRuns(Double.PositiveInfinity, 1.01 * B, B) == 0)
    // slow queries degrade at least as hard as fast ones
    assert(Bench.extraRuns(3.5, 0.86 * B, B) == 1)
    assert(Bench.extraRuns(3.5, 1.01 * B, B) == 0)
  }

  test("sidecar ratchet: committed minima never loosen pointwise") {
    // round-11 advice: a contended sweep replaced the whole baseline
    // with numbers 1.5-3x high, silently widening what future
    // regressions hide under. min(old, new) is monotone — never looser.
    val committed = Map("q01" -> 1.0, "q02" -> 5.0, "q03" -> 7.0,
      "q04" -> 2.0)
    val merged = Bench.ratchet(base, committed)
    def bestOf(n: String) = merged.find(_.name.startsWith(n)).get.best
    assert(bestOf("q01") == 1.0) // old faster record kept
    assert(bestOf("q02") == 2.0) // fresh improvement taken
    assert(bestOf("q04") == 2.0) // old faster record kept
    // a fresh FAILURE keeps the committed record as the yardstick —
    // the failure itself is reported in the BENCH line's failed array
    assert(bestOf("q03") == 7.0)
  }

  test("ratchet: a query absent from the baseline takes the fresh value") {
    val merged = Bench.ratchet(base, Map.empty)
    assert(merged.find(_.name.startsWith("q03")).get.best.isInfinity)
    assert(merged.find(_.name.startsWith("q01")).get.best == 1.5)
  }

  test("ratchet reset list: a renamed-semantics query takes the fresh " +
      "value even when the stale record is lower") {
    val committed = Map("q01" -> 0.1, "q02" -> 0.1)
    val merged = Bench.ratchet(base, committed, reset = Set("q01"))
    assert(merged.find(_.name.startsWith("q01")).get.best == 1.5) // fresh
    assert(merged.find(_.name.startsWith("q02")).get.best == 0.1) // ratcheted
  }

  test("ratchet ignores failed markers and keeps fresh on new queries") {
    val committed = Map("q03" -> -1.0) // -1 = previously failed, not a time
    val merged = Bench.ratchet(base, committed)
    assert(merged.find(_.name.startsWith("q03")).get.best.isInfinity)
  }

  test("parseQs reads compact and pretty-printed maps, skips -1") {
    val compact = """{"sf":"x","queries":{"q01":1.5,"q03":-1}}"""
    val pretty = "{\n  \"q01\": 1.5,\n  \"q03\": -1\n}"
    assert(Bench.parseQs(compact) == Map("q01" -> 1.5))
    assert(Bench.parseQs(pretty) == Map("q01" -> 1.5))
  }

  test("last-run artifact carries THIS sweep's full-precision map " +
      "(never the ratchet) plus the optional noop series") {
    // round-12 verdict item 1: the ratchet can never show a regression;
    // the committed last-run file must carry the fresh numbers
    val s = Bench.renderLastRun(base, "/root/testdata/sf0.1", Map.empty)
    assert(s.contains("\"sf\":\"/root/testdata/sf0.1\""), s)
    assert(s.contains("\"q01\":1.5") && s.contains("\"q04\":3.25"), s)
    assert(s.contains("\"q03\":-1"), s)
    assert(!s.contains("noop"), s)
    val d = Bench.renderLastRun(base, "sfX",
      Map("q01" -> 1.234, "q03" -> -1.0))
    assert(d.contains("\"noop\":{\"q01\":1.234,\"q03\":-1}"), d)
  }

  test("sidecar carries the FULL-precision map and the run's sf") {
    val s = Bench.renderSidecar(base, "/root/testdata/sf0.1")
    assert(s.contains("\"sf\":\"/root/testdata/sf0.1\""), s)
    assert(s.contains("\"q01\":1.5"), s)
    assert(s.contains("\"q04\":3.25"), s)
    assert(s.contains("\"q03\":-1"), s) // failed marker survives
  }
}
