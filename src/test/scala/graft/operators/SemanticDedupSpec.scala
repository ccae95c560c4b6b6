package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Vectors

class SemanticDedupSpec extends SparkTestBase {

  private def corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("kept set holds no same-cell near-duplicate pair (the dedup invariant)") {
    // greedy lowest-id rule: for any same-cell pair (a < b) with
    // cos >= tau, b is dropped — so no such pair can SURVIVE. (A dropped
    // vector may lack a kept representative when chains drop its only
    // neighbors; the invariant the corpus consumer relies on is the
    // kept set's pairwise cleanliness, and that one is absolute.)
    val tau = 0.35
    val m = SemanticDedup.manifest(corpus, "vec_id", "embedding",
      clusters = 8, iters = 2, tau = tau)
    val kept = m.filter(col("kept"))
      .join(corpus, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"),
        Vectors.norm(col("embedding")).as("nrm"))
    val survivors = kept.as("a").join(kept.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id") &&
          col("a.nrm") > 0 && col("b.nrm") > 0)
      .filter(Vectors.dot(col("a.embedding"), col("b.embedding")) /
        (col("a.nrm") * col("b.nrm")) >= tau)
      .count()
    assert(survivors === 0)
    // non-vacuous: something was actually dropped
    assert(m.filter(!col("kept")).count() > 0)
    graft.CacheScope.releaseAll()
  }

  test("planted exact duplicates collapse to one representative") {
    // clone 10 vectors under fresh ids far above the corpus range; each
    // clone is cosine-1 with its source, lands in the same cell, and
    // must be dropped in favor of the lower-id original
    val clones = corpus.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val planted = corpus.select(col("vec_id"), col("embedding"))
      .unionByName(clones)
    val m = SemanticDedup.manifest(planted, "vec_id", "embedding",
      clusters = 8, iters = 2, tau = 0.9999)
    val cloneRows = m.filter(col("vec_id") >= 1000000L).collect()
    assert(cloneRows.length === 10)
    cloneRows.foreach(r => assert(!r.getBoolean(2),
      s"clone ${r.getLong(0)} survived"))
    // the originals (lowest ids of their pair) stay kept
    val originals = m.filter(col("vec_id") < 10)
    assert(originals.filter(col("kept")).count() === 10)
    graft.CacheScope.releaseAll()
  }
}
