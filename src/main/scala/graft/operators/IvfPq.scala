package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed IVF + PQ search — the production 10 B-vector ANN
  * architecture (the FAISS `IVF…,PQ…` index shape): the coarse k-means
  * quantizer ([[IvfAnn.lloyd]]) PRUNES candidates to each query's
  * `nProbe` cells, and product-quantization codes
  * ([[ProductQuantizer.lloyd]]) SCORE them by ADC table lookups — so
  * scored pairs track `nProbe / clusters` of the corpus while the
  * per-pair cost is `m` map lookups instead of a `dim`-float dot
  * product.
  *
  * Both trained quantizers are driver-held [[CentroidState]] state, so
  * the whole search is ONE corpus projection (coarse cell + PQ codes,
  * both inline argmin expressions — the corpus is scanned once and never
  * shuffled) joined against the broadcast probe set, then the
  * bounded-heap top-k. At 10 B vectors the corpus side is stored
  * bucketed by coarse cell with only `codes` (m bytes/vector) resident:
  * a probe reads `nProbe` buckets of compressed codes — the float
  * vectors are never touched (compose with
  * [[ProductQuantizer.searchRefined]]'s exact re-rank to fetch just the
  * final shortlist).
  *
  * Codes are from GLOBAL codebooks (trained on whole vectors, not
  * per-cell residuals): cells only prune, quantization error is
  * cell-independent, and the q85 oracle replays both trainings
  * unchanged.
  */
object IvfPq {

  /** Top-`k` per query by ADC squared L2, scored only inside the
    * query's `nProbe` nearest coarse cells.
    * @return (qid, neighbor, approx_dist)
    */
  def search(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, clusters: Int, nProbe: Int, m: Int, dim: Int, codes: Int,
      coarseIters: Int = 1, pqIters: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val corpus = CentroidState.ensureCached(corpus0)
    val coarse = IvfAnn.lloyd(corpus, idCol, vecCol, clusters, coarseIters)
    val cb = ProductQuantizer.lloyd(corpus, idCol, vecCol, m, dim, codes,
      pqIters)
    // one projection: coarse routing cell + PQ codes per corpus row
    val encoded = corpus.select(col(idCol),
      CentroidState.nearestCell(col(vecCol), coarse).as("cell"),
      ProductQuantizer.codesExpr(col(vecCol), cb, m, dim).as("codes"))
    // one projection per query row: probed cells + ADC distance tables
    val qcached = CentroidState.ensureCached(queries)
    val probed = qcached.select(col(qidCol),
      explode(CentroidState.nearestCells(col(qvecCol), coarse, nProbe))
        .as("cell"),
      ProductQuantizer.tablesExpr(col(qvecCol), cb, m, dim).as("tables"))
    // broadcast within the IvfAnn.probeSide BYTE bound — each probe row
    // here carries a full m x codes ADC table, orders of magnitude
    // heavier than IvfAnn's per-row vector — degrade above it
    val scored = IvfAnn.probeSide(probed, qcached.count() * nProbe,
        bytesPerRow = m.toLong * codes * 8L + 64L)
      .join(encoded, "cell")
      .filter(col(qidCol) =!= col(idCol))
      .select(col(qidCol), col(idCol).as("neighbor"),
        aggregate(
          zip_with(col("codes"), col("tables"), (c, t) => element_at(t, c)),
          lit(0.0), (acc, x) => acc + x).as("approx_dist"))
    Dedup.topKPerKey(scored, Seq(qidCol),
      Seq(col("approx_dist").asc, col("neighbor").asc), k)
  }
}
