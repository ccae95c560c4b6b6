package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Maximal Marginal Relevance diversity re-rank (Carbonell & Goldstein
  * 1998) — the serving-side step between "top-k by score" and "top-k a
  * user actually wants": from each query's candidate shortlist, greedily
  * select items that are RELEVANT but not REDUNDANT with what is already
  * selected: `argmax λ·rel − (1−λ)·max_{s∈S} cos(c, s)`. Near-duplicate
  * candidates (which brute/IVF/PQ top-k surfaces as runs of the same
  * answer) cost their similarity to the already-picked copy, so the
  * second pick jumps to the next TOPIC instead of the next duplicate —
  * retrieval's answer to the corpus-side SemanticDedup.
  *
  * Scale shape: the greedy loop is inherently sequential in k, so the
  * unroll is k bounded rounds (the BPE-train / Lloyd-iteration pattern),
  * each a join of the (queries·m)-row shortlist frame against the
  * (queries·1)-row pick frame plus a [[Dedup.topKPerKey]] k=1 reduction —
  * per-round cost is shortlist-sized regardless of corpus size, because
  * MMR only ever sees the candidates the ANN tier already shortlisted.
  * Selected state rides as per-query id/vector arrays (≤ k entries, the
  * bounded-array discipline); `max` over them is order-independent, so
  * array build order never matters. All cosine arithmetic is the
  * [[Vectors]] double left-fold — bit-identical to the oracle's unrolled
  * replay, which is what lets even the argmax DECISIONS hash-match.
  */
object MmrRerank {

  /** Greedy MMR selection of `k` per query from bounded shortlists.
    *
    * @param cands shortlist rows `(qidCol, idCol, relCol double,
    *              vecCol array<float>)`, ≤ m per query
    * @return one row per (query, rank 1..k): qid, rank, id, rel, mmr —
    *         fewer when a query's shortlist runs dry
    */
  def rerank(cands: DataFrame, qidCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"MmrRerank.rerank needs k >= 1, got $k")
    require(lambda > 0.0 && lambda <= 1.0,
      s"MmrRerank.rerank needs lambda in (0, 1], got $lambda")
    val c = graft.CacheScope.cache(cands)
    val qid = col(qidCol)

    // selected state: per-query arrays of picked ids/vectors (≤ k)
    var sel = c.select(qid).distinct()
      .withColumn("__ids", array().cast("array<long>"))
      .withColumn("__vecs", array().cast("array<array<float>>"))
    var picks = Vector.empty[DataFrame]

    (1 to k).foreach { r =>
      val scored = c.join(sel, qidCol)
        .filter(!array_contains(col("__ids"), col(idCol)))
        // max over already-picked vectors; empty (round 1) → 0.0, so
        // the first pick is pure relevance — the MMR convention
        .withColumn("__maxsim", coalesce(
          array_max(transform(col("__vecs"),
            (v: Column) => Vectors.cosine(v, col(vecCol)))),
          lit(0.0)))
        .withColumn("__mmr",
          lit(lambda) * col(relCol) - lit(1.0 - lambda) * col("__maxsim"))
      // cached: sel_{r} references sel_{r-1} twice (once through the
      // pick, once directly), so an uncached chain doubles plan size
      // per round and re-executes every earlier round's TopKPerKey
      // from the final union — the join-tower failure the
      // PageRank/Lloyd iterations also truncate. The cached frames are
      // queries·1 rows each, k of them total.
      val pick = graft.CacheScope.cache(Dedup.topKPerKey(scored, Seq(qidCol),
        Seq(col("__mmr").desc, col(idCol).asc), 1))
      picks :+= pick.select(qid, lit(r.toLong).as("rank"), col(idCol),
        col(relCol), col("__mmr").as("mmr"))
      sel = graft.CacheScope.cache(sel.join(
          pick.select(qid, col(idCol).as("__pid"), col(vecCol).as("__pvec")),
          qidCol)
        .select(qid,
          concat(col("__ids"), array(col("__pid"))).as("__ids"),
          concat(col("__vecs"), array(col("__pvec"))).as("__vecs")))
    }
    picks.reduce(_ unionByName _)
  }
}
