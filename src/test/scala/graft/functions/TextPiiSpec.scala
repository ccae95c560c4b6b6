package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextPiiSpec extends SparkTestBase {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Text.redactPii(col("t"))).collect().head.getString(0)

  private def count(s: String, pat: String): Long =
    Seq(s).toDF("t").select(Text.piiCount(col("t"), pat)).collect().head.getLong(0)

  test("redacts every rule type, multiple occurrences, in one pass") {
    val in = "mail a.b@x.co and c@y.org, ip 10.1.2.3 then 192.168.0.1, " +
      "call 555-0199 or 555-0200"
    val out = redact(in)
    assert(out === "mail <EMAIL> and <EMAIL>, ip <IP> then <IP>, " +
      "call <PHONE> or <PHONE>")
  }

  test("counts match occurrences before redaction") {
    val in = "a@b.cc 1.2.3.4 555-1234 c@d.ee"
    assert(count(in, Text.PiiRules(0)._1) === 2L)
    assert(count(in, Text.PiiRules(1)._1) === 1L)
    assert(count(in, Text.PiiRules(2)._1) === 1L)
  }

  test("mixed- and upper-case emails are redacted WHOLE, not just the " +
      "lowercase tail") {
    assert(redact("mail User@Mail.Example.COM now") === "mail <EMAIL> now")
    assert(redact("JohnDoe@x.com and ALL.CAPS@HOST.ORG") ===
      "<EMAIL> and <EMAIL>")
    assert(count("A@B.CC a@b.cc", Text.PiiRules(0)._1) === 2L)
  }

  test("redaction is idempotent (placeholders match no rule)") {
    val in = "x a@b.cc 1.2.3.4 555-1234 y"
    val once = redact(in)
    assert(redact(once) === once)
  }

  test("clean text passes through untouched") {
    val in = "no pii here, just words and 42 numbers like 3.14"
    assert(redact(in) === in)
  }

  test("version-like dotted numbers are not IPs unless 4 octets") {
    assert(redact("v1.2.3 stays, 1.2.3.4 goes") === "v1.2.3 stays, <IP> goes")
  }
}
