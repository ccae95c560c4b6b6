package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Cell-scoped embedding near-duplicate pruning — the SemDeDup shape
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): quantize the corpus with the IVF
  * coarse k-means quantizer ([[IvfAnn]]), compare vectors only WITHIN
  * their cell, and prune until the KEPT set is pairwise non-duplicate.
  *
  * This is the scale path past the bounded-sample exact pass (q26) and
  * the sign-bucket LSH pass (q38): pairwise work is Σ n_c² over cells
  * instead of n² over the corpus, and — unlike fixed sign buckets — the
  * cells adapt to the data's density (k-means), so semantically close
  * vectors land in the same cell by construction. At 10 B vectors with
  * clusters ≈ √n, expected per-cell work stays ~n per cell pass, and the
  * whole manifest is ONE shuffle of the corpus by cell (the self-join
  * key) plus the O(clusters·dim) driver-held training.
  *
  * Keep policy: a vector is DROPPED iff some lower-id vector in the same
  * cell has cosine ≥ `tau` with it. The invariant this buys is that the
  * kept set is PAIRWISE non-duplicate within every cell; a dropped
  * vector is NOT guaranteed a kept representative within `tau` (its
  * lower-id witness may itself have been dropped by a still-lower id —
  * chains prune deeper than a keep-against-kept greedy scan would).
  * The rule is deterministic (no training-order dependence: the
  * quantizer is the reproducible [[IvfAnn.lloyd]] state) and
  * SQL-expressible, so the full chain — train, assign, scope, prune —
  * is oracle-checkable end-to-end (q114).
  *
  * Reference anchor: the reference pipeline's duplicate reconciliation
  * (`03_bronze_processing.py:109-142`) is exact-key; this tier extends
  * it to semantic space as a first-class training-data operator.
  */
object SemanticDedup {

  /** Per-vector manifest: `(idCol, cell, kept)` for every corpus vector.
    *
    * @param clusters IVF cell count (√n sizing at scale)
    * @param iters    Lloyd passes (one corpus scan each)
    * @param tau      cosine threshold at or above which two same-cell
    *                 vectors are near-duplicates
    */
  def manifest(corpus0: DataFrame, idCol: String, vecCol: String,
      clusters: Int, iters: Int, tau: Double): DataFrame = {
    // the trainer alone reads the corpus iters+1 times (seeding collect
    // plus one scan per Lloyd pass) — cache it like IvfAnn.search does
    val corpus = graft.CacheScope.cache(corpus0)
    val cents = IvfAnn.lloyd(corpus, idCol, vecCol, clusters, iters)
    // assignment is a pure projection (no shuffle): argmin over the
    // driver-held centroid table, inline expression
    // three consumers (both pair-join branches + the manifest) read the
    // assigned frame — persist via the session cache registry so the
    // assignment projection runs once (released by the gate runners)
    val e = graft.CacheScope.cache(
      corpus.select(col(idCol), col(vecCol),
        CentroidState.nearestCell(col(vecCol), cents).as("cell"),
        Vectors.norm(col(vecCol)).as("nrm")))
    // within-cell pairwise: the self-join's ONLY shuffle is by cell;
    // norms are hoisted per vector (n sqrt-dots, not n² extra dots).
    // Zero-norm vectors carry no direction — excluded from pairs, so
    // they are always kept (same guard as q26/q27).
    val cos = Vectors.dot(col("a." + vecCol), col("b." + vecCol)) /
      (col("a.nrm") * col("b.nrm"))
    val dropped = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a." + idCol) < col("b." + idCol) &&
          col("a.nrm") > 0 && col("b.nrm") > 0)
      .filter(cos >= tau)
      .select(col("b." + idCol).as(idCol))
      .distinct()
    e.select(col(idCol), col("cell"))
      .join(dropped.withColumn("__dropped", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        col("__dropped").isNull.as("kept"))
  }
}
