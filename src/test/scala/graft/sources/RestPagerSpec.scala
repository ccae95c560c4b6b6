package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class RestPagerSpec extends AnyFunSuite {

  // page body is "n=<count>"; item counter parses it
  private def counter(body: String): Int = body.stripPrefix("n=").toInt

  test("paginates until a short page, rate-limiting between requests") {
    var calls = Vector.empty[String]
    var sleeps = Vector.empty[Long]
    val pager = new RestPager(
      transport = url => { calls :+= url
        if (url.contains("offset=1&")) "n=3" else "n=1" },
      pageItemCount = counter, limit = 3,
      rateLimitMs = 1200L, sleep = ms => sleeps :+= ms)
    val pages = pager.fetchAll((off, lim) => s"offset=$off&limit=$lim")
    assert(pages === Seq("n=3", "n=1"))
    assert(calls === Vector("offset=1&limit=3", "offset=4&limit=3"))
    assert(sleeps === Vector(1200L)) // no pause before the first request
  }

  test("retries with linear backoff then succeeds") {
    var attempts = 0
    var sleeps = Vector.empty[Long]
    val pager = new RestPager(
      transport = _ => { attempts += 1
        if (attempts < 3) throw new RuntimeException("503") else "n=0" },
      pageItemCount = counter, limit = 10,
      maxRetries = 3, sleep = ms => sleeps :+= ms)
    assert(pager.fetchAll((o, l) => s"u$o") === Seq("n=0"))
    assert(attempts === 3)
    assert(sleeps === Vector(5000L, 10000L)) // 5s·(attempt+1)
  }

  test("gives up after maxRetries and surfaces the cause") {
    val pager = new RestPager(
      transport = _ => throw new RuntimeException("boom"),
      pageItemCount = counter, limit = 10,
      maxRetries = 2, sleep = _ => ())
    val e = intercept[RuntimeException](pager.fetchWithRetry("u"))
    assert(e.getMessage.contains("after 2 attempts"))
  }
}
