package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvfPqSpec extends SparkTestBase {

  private val M = 8
  private val Dim = 64

  private def corpus = graft.sources.Tables.load(spark, sfDir, "embeddings")
  private def queries = corpus.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  // the shared deterministic clustered fixture (16 well-separated
  // centroids + small hash noise, no rand())
  private def synth(n: Int) = {
    val centroid = (id: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =>
      pmod(id % 16 * lit(131) + d * lit(31), lit(97)) / lit(48.5) - lit(1.0)
    val noise = (id: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =>
      (pmod(id * lit(7919) + d * lit(104729), lit(101)) - lit(50.0)) / lit(1000.0)
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(Dim)),
        d => (centroid(col("id"), d) + noise(col("id"), d)).cast("float"))
        .as("embedding"))
  }

  test("every query returns k rows, all from its probed coarse cells") {
    val k = 3
    val nProbe = 4
    val out = IvfPq.search(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = k, clusters = 16, nProbe = nProbe,
        m = M, dim = Dim, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 10 * k)
    // pruning contract: each neighbour's coarse cell is in its query's
    // probe set — recompute both assignments through the public API
    val cents = IvfAnn.centroids(corpus, "vec_id", "embedding",
      clusters = 16, iters = 1)
    val cellOf = IvfAnn.assign(corpus, cents, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val probesOf = IvfAnn.probes(queries, cents, "qid", "qv", nProbe)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (qid, nb) =>
      assert(probesOf(qid).contains(cellOf(nb)),
        s"neighbor $nb of query $qid came from an unprobed cell")
    }
  }

  test("on clustered data the composed search keeps same-cluster recall") {
    val k = 5
    val s = synth(480)
    val q = s.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val out = IvfPq.search(s, "vec_id", "embedding", q, "qid", "qv",
        k = k, clusters = 16, nProbe = 2, m = M, dim = Dim, codes = 16,
        coarseIters = 2, pqIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 8 * k)
    val sameCluster = out.count { case (qid, nb) => qid % 16 == nb % 16 }
    assert(sameCluster.toDouble / out.length >= 0.9,
      s"same-cluster fraction ${sameCluster.toDouble / out.length}")
  }

  test("composed search is deterministic across runs") {
    def run() = IvfPq.search(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = 3, clusters = 16, nProbe = 4,
        m = M, dim = Dim, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(run() === run())
  }
}
