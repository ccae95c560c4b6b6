package graft.sources

import scala.annotation.tailrec

/** Paginated REST ingestion control loop (SURVEY.md §2a S1).
  *
  * Mirrors the reference's USGS FDSN fetch discipline
  * (`02_ingestion.py:110-147`): offset pagination in `limit`-sized pages
  * until a short page, bounded retries with linear backoff, and a
  * rate-limit pause between requests. Transport, clock, and page-size
  * probe are injected, so the loop is fully unit-testable offline (this
  * sandbox has zero egress) and the production wiring is just
  * `transport = url => java.net.http send`.
  *
  * Driver-side by design: the HTTP loop lands raw pages; PARSING is
  * executor work (`GeoJsonSource.flatten` over the landed files) — the
  * opposite split from the reference, which parsed driver-side in Python.
  */
final class RestPager(
    transport: String => String,
    pageItemCount: String => Int,
    limit: Int = 20000,
    maxRetries: Int = 3,
    backoffMs: Int => Long = attempt => 5000L * (attempt + 1),
    rateLimitMs: Long = 1200L,
    sleep: Long => Unit = Thread.sleep) {

  /** Fetch one URL with bounded retries (reference `02:121-129`). */
  def fetchWithRetry(url: String): String = {
    @tailrec def go(attempt: Int): String =
      try transport(url)
      catch {
        case e: Exception if attempt < maxRetries - 1 =>
          sleep(backoffMs(attempt))
          go(attempt + 1)
        case e: Exception =>
          throw new RuntimeException(
            s"fetch failed after $maxRetries attempts: $url", e)
      }
    go(0)
  }

  /** Walk offset pagination until a short page, handing each raw page
    * to `land` AS IT ARRIVES (reference `02:131-147`: `offset += limit`
    * until `returned < limit`). Streaming is the primary API: a backfill
    * of millions of events is hundreds of multi-MB pages, and holding
    * them all in the driver heap before landing any would OOM — `land`
    * should write each body straight to the landing directory.
    */
  def foreachPage(urlFor: (Int, Int) => String)(land: String => Unit): Unit = {
    @tailrec def go(offset: Int, first: Boolean): Unit = {
      if (!first) sleep(rateLimitMs)
      val body = fetchWithRetry(urlFor(offset, limit))
      land(body)
      if (pageItemCount(body) >= limit) go(offset + limit, first = false)
    }
    go(offset = 1, first = true) // FDSN offsets are 1-based
  }

  /** Collect every page in memory — convenience for tests and small
    * pulls only; use [[foreachPage]] for backfills.
    */
  def fetchAll(urlFor: (Int, Int) => String): Seq[String] = {
    val pages = Seq.newBuilder[String]
    foreachPage(urlFor)(pages += _)
    pages.result()
  }
}
