package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Expectations.Rule

class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    (1L, 10.0, "a"),
    (2L, -5.0, "b"),   // price_positive violation
    (3L, 0.0, null),   // price_positive + name_not_null violations
    (4L, 2.0, "d")
  ).toDF("id", "price", "name")

  private val rules = Seq(
    Rule("price_positive", col("price") > 0),
    Rule("name_not_null", col("name").isNotNull))

  test("report counts violations per rule in one pass") {
    val r = Expectations.report(fixture, rules)
      .as[(String, Long)].collect().toMap
    assert(r == Map("price_positive" -> 2L, "name_not_null" -> 1L))
  }

  test("null predicate results are not violations unless explicitly ruled") {
    // price IS NULL: (null > 0) is NULL -> not counted, SQL-standard
    val withNull = Seq((1L, Option.empty[Double]), (2L, Some(1.0)))
      .toDF("id", "price")
    val r = Expectations.report(withNull, Seq(Rule("pos", col("price") > 0)))
      .as[(String, Long)].collect().toMap
    assert(r("pos") == 0L)
  }

  test("report yields 0 (not NULL) violations on an empty table") {
    val empty = fixture.filter(col("id") < 0)
    val r = Expectations.report(empty, rules)
      .as[(String, Long)].collect().toMap
    assert(r == Map("price_positive" -> 0L, "name_not_null" -> 0L))
  }

  test("rule names with quotes, spaces, and keywords are safe") {
    val hostile = Seq(
      Rule("price's > 'limit'", col("price") > 0),
      Rule("select from where", col("name").isNotNull))
    val r = Expectations.report(fixture, hostile)
      .as[(String, Long)].collect().toMap
    assert(r == Map("price's > 'limit'" -> 2L, "select from where" -> 1L))
  }

  test("quarantine partitions exactly even when a predicate is NULL") {
    // price IS NULL under a non-null-checking rule: (null > 0) is NULL,
    // which by the documented semantics is NOT a violation — the row must
    // land in `clean`, not disappear from both outputs
    val withNull = Seq((1L, Option.empty[Double]), (2L, Some(1.0)),
      (3L, Some(-2.0))).toDF("id", "price")
    val (clean, bad) =
      Expectations.quarantine(withNull, Seq(Rule("pos", col("price") > 0)))
    assert(clean.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(bad.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(clean.count() + bad.count() == withNull.count())
  }

  test("quarantine splits rows and names the failed rules") {
    val (clean, bad) = Expectations.quarantine(fixture, rules)
    assert(clean.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    val reasons = bad.select(col("id"), col("failed_expectations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reasons(2L) == Seq("price_positive"))
    assert(reasons(3L).toSet == Set("price_positive", "name_not_null"))
    // nothing lost, nothing duplicated
    assert(clean.count() + bad.count() == fixture.count())
  }
}
