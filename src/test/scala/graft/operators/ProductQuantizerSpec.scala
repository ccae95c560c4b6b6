package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Vectors

class ProductQuantizerSpec extends SparkTestBase {

  private val M = 8
  private val Dim = 64

  private def corpus = graft.sources.Tables.load(spark, sfDir, "embeddings")
  private def queries = corpus.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  test("every vector encodes to m codes drawn from its subspace codebook") {
    val cb = ProductQuantizer.train(corpus, "vec_id", "embedding",
      m = M, dim = Dim, k = 16, iters = 2)
    val enc = ProductQuantizer.encode(corpus, "vec_id", "embedding",
      cb, M, Dim)
    assert(enc.count() == corpus.count())
    assert(enc.filter(size(col("codes")) =!= M).count() == 0)
    // codes reference existing codebook cells per subspace
    val valid = cb.groupBy("m").agg(collect_set("cell").as("cells"))
      .orderBy("m").collect().map(_.getSeq[Int](1).toSet)
    enc.select(posexplode(col("codes")).as(Seq("m", "code"))).collect()
      .foreach(r => assert(valid(r.getInt(0)).contains(r.getInt(1))))
  }

  test("ADC search recall against brute force clears the floor") {
    val k = 5
    val pq = ProductQuantizer.search(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = k, m = M, dim = Dim, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute-force squared-L2 ground truth, same tiebreak direction
    val bf = Dedup.topKPerKey(
        queries.crossJoin(corpus)
          .filter(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("neighbor"),
            (Vectors.dot(col("qv"), col("qv"))
              + Vectors.dot(col("embedding"), col("embedding"))
              - lit(2.0) * Vectors.dot(col("qv"), col("embedding")))
              .as("d2")),
        Seq("qid"), Seq(col("d2").asc, col("neighbor").asc), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(pq.size == bf.size)
    val recall = pq.intersect(bf).size.toDouble / bf.size
    // the fixture embeddings are near-random (same-label cosine ~= 0),
    // the regime where ANY quantizer's top-5 degrades — chance level is
    // 5/499 ~= 0.01, so 0.12+ is still >10x better than random. The
    // clustered-data test below is the real recall gate.
    assert(recall >= 0.12, s"recall $recall")
  }

  test("on clustered data ADC recall is high") {
    // deterministic synthetic corpus: 16 well-separated centroids (hash
    // components in [-1,1]) + small hash noise; no rand(), reproducible
    val n = 480
    val centroid = (id: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =>
      pmod(id % 16 * lit(131) + d * lit(31), lit(97)) / lit(48.5) - lit(1.0)
    val noise = (id: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =>
      (pmod(id * lit(7919) + d * lit(104729), lit(101)) - lit(50.0)) / lit(1000.0)
    val synth = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(Dim)),
        d => (centroid(col("id"), d) + noise(col("id"), d)).cast("float"))
        .as("embedding"))
    val q = synth.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val k = 5
    val pq = ProductQuantizer.search(synth, "vec_id", "embedding",
        q, "qid", "qv", k = k, m = M, dim = Dim, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // quantization collapses a tight cluster onto one code word, so
    // exact-rank recall within a cluster is tie-broken noise — the
    // guarantee PQ makes is CLUSTER retrieval: neighbours come from the
    // query's own cluster (true nearest all share it by construction)
    assert(pq.length == 8 * k)
    val sameCluster = pq.count { case (qid, nb) => qid % 16 == nb % 16 }
    assert(sameCluster.toDouble / pq.length >= 0.9,
      s"same-cluster fraction ${sameCluster.toDouble / pq.length}")
  }

  test("exact re-ranking beats raw ADC recall on the hard fixture") {
    val k = 5
    def recallOf(result: Set[(Long, Long)], bf: Set[(Long, Long)]) =
      result.intersect(bf).size.toDouble / bf.size
    val bf = Dedup.topKPerKey(
        queries.crossJoin(corpus)
          .filter(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id").as("neighbor"),
            (Vectors.dot(col("qv"), col("qv"))
              + Vectors.dot(col("embedding"), col("embedding"))
              - lit(2.0) * Vectors.dot(col("qv"), col("embedding")))
              .as("d2")),
        Seq("qid"), Seq(col("d2").asc, col("neighbor").asc), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = ProductQuantizer.search(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = k, m = M, dim = Dim, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = ProductQuantizer.searchRefined(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = k, m = M, dim = Dim, codes = 16,
        refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined.size == bf.size)
    // re-ranking can only reorder ADC's shortlist with TRUE distances:
    // recall must not drop, and on this near-random corpus it must rise
    assert(recallOf(refined, bf) > recallOf(adc, bf),
      s"refined ${recallOf(refined, bf)} vs adc ${recallOf(adc, bf)}")
  }

  test("training, encoding, and search are deterministic across runs") {
    def run() = ProductQuantizer.search(corpus, "vec_id", "embedding",
        queries, "qid", "qv", k = 3, m = M, dim = Dim, codes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run() === run())
  }
}
