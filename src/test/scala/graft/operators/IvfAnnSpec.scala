package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Vectors

class IvfAnnSpec extends SparkTestBase {

  private def corpus = graft.sources.Tables.load(spark, sfDir, "embeddings")
  private def queries = corpus.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("every corpus vector lands in exactly one cell") {
    val cents = IvfAnn.centroids(corpus, "vec_id", "embedding",
      clusters = 8, iters = 2)
    assert(cents.count() <= 8 && cents.count() > 0)
    val cells = IvfAnn.assign(corpus, cents, "vec_id", "embedding")
    assert(cells.count() === corpus.count())
    assert(cells.select("vec_id").distinct().count() === corpus.count())
  }

  test("probed search prunes the corpus yet keeps useful recall") {
    val k = 5
    val ivf = IvfAnn.search(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = k, clusters = 8, nProbe = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force ground truth, same tiebreak
    val bf = Dedup.topKPerKey(
        queries.crossJoin(corpus)
          .filter(col("qid") =!= col("vec_id") &&
            Vectors.norm(col("qv")) > 0 && Vectors.norm(col("embedding")) > 0)
          .select(col("qid"), col("vec_id").as("neighbor"),
            Vectors.cosine(col("qv"), col("embedding")).as("cosine")),
        Seq("qid"), Seq(col("cosine").desc, col("neighbor").asc), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ivf.size === bf.size)
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    // 3 of 8 cells probed — recall must beat the random-pruning floor
    assert(recall >= 0.4, s"recall $recall")
  }

  test("on clustered data probed search keeps same-cluster recall high") {
    // deterministic synthetic corpus: 16 well-separated centroids (hash
    // components in [-1,1]) + small hash noise; no rand(), reproducible —
    // the ProductQuantizerSpec clustered fixture, IVF-sized
    val dim = 64
    val n = 480
    val centroid = (id: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =>
      pmod(id % 16 * lit(131) + d * lit(31), lit(97)) / lit(48.5) - lit(1.0)
    val noise = (id: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =>
      (pmod(id * lit(7919) + d * lit(104729), lit(101)) - lit(50.0)) / lit(1000.0)
    val synth = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        d => (centroid(col("id"), d) + noise(col("id"), d)).cast("float"))
        .as("embedding"))
    val q = synth.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val k = 5
    val ivf = IvfAnn.search(synth, "vec_id", "embedding", q, "qid", "qv",
        k = k, clusters = 16, nProbe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // with well-separated clusters the coarse quantizer must route each
    // query to its own cluster's cell: neighbours share the query's
    // cluster (true nearest all do by construction) — probing 2 of 16
    // cells yet recalling the right ones is the whole IVF contract
    assert(ivf.length === 8 * k)
    val sameCluster = ivf.count { case (qid, nb) => qid % 16 == nb % 16 }
    assert(sameCluster.toDouble / ivf.length >= 0.9,
      s"same-cluster fraction ${sameCluster.toDouble / ivf.length}")
  }

  test("index build and search are deterministic across runs") {
    def run() = IvfAnn.search(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = 3, clusters = 8, nProbe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(run() === run())
  }

  test("recallSweep is monotone in nProbe and exact at full probe width") {
    val clusters = 8
    val sweep = IvfAnn.recallSweep(corpus, "vec_id", "embedding",
        nQueries = 10, k = 3, clusters = clusters,
        nProbes = Seq(1, 2, 4, clusters), iters = 2)
      .orderBy(col("n_probe"))
      .collect().map(r => (r.getInt(0), r.getDouble(3)))
    assert(sweep.map(_._1).toSeq === Seq(1, 2, 4, clusters))
    // a wider probe budget can only add candidates — recall is monotone
    sweep.sliding(2).foreach { case Array((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (nProbe=$p1) to $r2 (nProbe=$p2)")
    }
    // probing every cell IS brute force: recall must be exactly 1
    assert(sweep.last._2 === 1.0, s"full-width recall ${sweep.last._2}")
  }

  test("driftReport flags an out-of-distribution delta (retrain signal)") {
    val base = corpus.filter(col("vec_id") % 5 =!= 0)
    val cents = IvfAnn.centroids(base, "vec_id", "embedding",
      clusters = 8, iters = 2)
    // in-distribution delta: the held-out slice of the same corpus
    val inDist = corpus.filter(col("vec_id") % 5 === 0)
    // out-of-distribution delta: the same held-out vectors shifted by a
    // constant offset in every dimension — far from every trained cell
    val shifted = inDist.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(3.0f)).as("embedding"))
    def totalDrift(delta: org.apache.spark.sql.DataFrame): Double = {
      val tagged = base.select(col("vec_id"), col("embedding"),
          lit("base").as("gen"))
        .unionByName(delta.select(col("vec_id"), col("embedding"),
          lit("delta").as("gen")))
      IvfAnn.driftReport(tagged, "gen", "embedding", cents)
        .agg(avg(col("drift"))).collect().head.getDouble(0)
    }
    val near = totalDrift(inDist)
    val far = totalDrift(shifted)
    // a held-out slice of the SAME distribution sits near the trained
    // centroids (ratio ~1); the shifted batch must read clearly stale
    assert(near < 2.0, s"in-distribution drift $near")
    assert(far > 2.0 * near, s"shifted drift $far vs in-dist $near")
  }
}
