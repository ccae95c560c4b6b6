package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Substring-level deduplication: remove token SPANS that repeat across
  * documents (the "repeated n-gram" scrub of Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL'22 — done there
  * with a suffix array; here re-expressed as the distributed
  * position-indexed n-gram pipeline that Spark can run at corpus
  * scale). Document-level dedup (q22–q25) misses partial overlap:
  * boilerplate headers, license blocks, and syndicated passages
  * embedded in otherwise-unique documents. This operator finds every
  * n-gram occurring in ≥ `minDf` DISTINCT documents and deletes the
  * token positions it covers, keeping the unique remainder.
  *
  * Scale shape: position-indexed n-grams are one generator scan
  * (O(tokens) rows); the hot set is a groupBy(gram) with map-side
  * combine; occurrences join the hot set with a LEFT SEMI (broadcast
  * when the hot set is small — it is bounded by grams repeating across
  * docs, not by corpus size); coverage positions aggregate per doc.
  * Nothing is ever quadratic in documents, and re-assembly is a scalar
  * higher-order-function projection. The trade vs a suffix array:
  * spans shorter than `n` tokens survive, and a repeated span of
  * length L ≥ n is detected via its L−n+1 hot n-grams.
  */
object SpanScrub {

  /** `(idCol, i, g)`: every position-indexed word n-gram, `i` 1-based.
    * Documents shorter than `n` tokens emit nothing (they carry no
    * span of length `n`).
    */
  def positionedNgrams(df: DataFrame, idCol: String, toksCol: String,
      n: Int): DataFrame = {
    val toks = col(toksCol)
    val starts = when(size(toks) >= n,
      sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("__toks"), explode(starts).as("i"))
      .select(col(idCol), col("i"),
        array_join(slice(col("__toks"), col("i"), lit(n)), " ").as("g"))
  }

  /** Per-gram distinct-document counts — the scrub's "model". Counts
    * over disjoint corpus slices are ADDITIVE (a doc lives in exactly
    * one slice), so the model maintains incrementally: merge a slice's
    * counts into a persisted state table with one groupBy-sum (see
    * q134), exactly the sketch-maintenance pattern.
    */
  def gramCounts(df: DataFrame, idCol: String, toksCol: String,
      n: Int): DataFrame =
    positionedNgrams(df, idCol, toksCol, n)
      .groupBy(col("g"))
      .agg(countDistinct(col(idCol)).as("df"))

  /** Scrub hot spans: per input row adds
    *  - `n_tokens`  — token count before the scrub,
    *  - `n_removed` — distinct token positions covered by a hot n-gram,
    *  - `n_spans`   — hot n-gram occurrences in the doc,
    *  - `cleaned`   — the surviving tokens, original order.
    */
  def scrub(df: DataFrame, idCol: String, toksCol: String,
      n: Int, minDf: Long): DataFrame = {
    val ex = graft.CacheScope.cache(positionedNgrams(df, idCol, toksCol, n))
    val hot = ex.groupBy(col("g"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("g"))
    scrubAgainst(df, ex, hot, idCol, toksCol, n)
  }

  /** [[scrub]] with an EXTERNAL hot set (a `g`-column frame, e.g. the
    * thresholded maintained model from [[gramCounts]] merges).
    */
  def scrubWith(df: DataFrame, idCol: String, toksCol: String,
      n: Int, hot: DataFrame): DataFrame = {
    val ex = graft.CacheScope.cache(positionedNgrams(df, idCol, toksCol, n))
    scrubAgainst(df, ex, hot.select(col("g")), idCol, toksCol, n)
  }

  private def scrubAgainst(df: DataFrame, ex: DataFrame, hot: DataFrame,
      idCol: String, toksCol: String, n: Int): DataFrame = {
    val occ = graft.CacheScope.cache(ex.join(hot, Seq("g"), "left_semi"))
    val cov = occ
      .select(col(idCol), explode(sequence(col("i"), col("i") + (n - 1))).as("p"))
      .distinct()
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("p"))).as("__ps"))
    val spans = occ.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"))
    val ps: Column = coalesce(col("__ps"), array().cast("array<int>"))
    // O(L + R) reassembly per doc (L tokens, R removed positions):
    // array_except builds a hash set over the removed positions and
    // walks 1..L once, so the kept-position list costs constant work
    // per token — a per-token array_contains(ps, ·) membership scan
    // would be O(L·R), ~10⁸ comparisons for a 10k-token boilerplate-
    // heavy doc. sequence(1, L) is distinct and ascending, array_except
    // preserves left-operand order, so kept positions come out in
    // document order and element_at re-reads each surviving token O(1).
    val allPos = when(size(col(toksCol)) >= 1,
      sequence(lit(1), size(col(toksCol))))
      .otherwise(array().cast("array<int>"))
    df.join(cov, Seq(idCol), "left")
      .join(spans, Seq(idCol), "left")
      .withColumn("n_tokens", size(col(toksCol)).cast("long"))
      .withColumn("n_removed", size(ps).cast("long"))
      .withColumn("n_spans", coalesce(col("n_spans"), lit(0L)))
      .withColumn("cleaned",
        when(col(toksCol).isNotNull,
          transform(array_except(allPos, ps),
            p => element_at(col(toksCol), p))))
      .drop("__ps")
  }
}
