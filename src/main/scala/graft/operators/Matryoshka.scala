package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matryoshka (MRL) truncated-dimension ANN tier — serve approximate
  * neighbors from a PREFIX of each embedding (Kusupati et al., "Matryoshka
  * Representation Learning": MRL-trained embeddings order information by
  * coordinate, so the first d′ dims are themselves a valid embedding; the
  * big embedding APIs expose exactly this truncation knob).
  *
  * The tier between float brute force (q27) and the code-based quantizers
  * (SQ8/PQ/binary): stage 1 scans only `dims` of `dim` coordinates —
  * `dim/dims`× less compute AND, in a columnar layout that stores the
  * prefix as its own column (or with parquet nested-column pruning on a
  * split schema), `dim/dims`× less I/O — then only the `refine·k`
  * shortlist rows fetch full-width vectors for an exact re-rank
  * ([[BinaryQuantizer.rerank]] — the same byte-bounded shortlist-join
  * discipline as the binary tier: the full-width corpus is equi-join
  * probed in place, never shuffled, and served distances are exact).
  *
  * No trained state at all — truncation is a projection — so the "index"
  * is just the prefix column; appends/deletes are the primary store's.
  */
object Matryoshka {

  /** Prefix-distance top-k: `(qidCol, neighbor, pdist)` where `pdist` is
    * squared L2 over the first `dims` coordinates only.
    */
  def search(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dims: Int, k: Int): DataFrame =
    search(corpus0, idCol, vecCol, queries, qidCol, qvecCol, dims, k,
      queries.count())

  private def search(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dims: Int, k: Int, qRows: Long): DataFrame = {
    val corpus = CentroidState.ensureCached(corpus0)
    val pc = corpus.select(col(idCol), slice(col(vecCol), 1, dims).as("__pv"))
    val q = queries.select(col(qidCol),
      slice(col(qvecCol), 1, dims).as("__qp"))
    val probe = IvfAnn.probeSide(q, qRows,
      bytesPerRow = 16L + 4L * dims)
    val scored = pc.crossJoin(probe)
      .filter(col(qidCol) =!= col(idCol))
      .select(col(qidCol), col(idCol).as("neighbor"),
        BinaryQuantizer.l2(col("__qp"), col("__pv")).as("pdist"))
    Dedup.topKPerKey(scored, Seq(qidCol),
      Seq(col("pdist").asc, col("neighbor").asc), k)
  }

  /** Truncated-prefix shortlist (`refine·k` per query) + exact full-width
    * re-rank. @return (qidCol, neighbor, dist) with exact squared L2.
    */
  def searchRefined(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dims: Int, dim: Int, k: Int, refine: Int): DataFrame = {
    val corpus = CentroidState.ensureCached(corpus0)
    val qRows = queries.count()
    val shortIds = graft.CacheScope.cache(
      search(corpus, idCol, vecCol, queries, qidCol, qvecCol, dims,
          k * refine, qRows)
        .select(col(qidCol), col("neighbor")))
    BinaryQuantizer.rerank(shortIds, corpus, idCol, vecCol, queries,
      qidCol, qvecCol, dim, k, qRows, k.toLong * refine)
  }
}
