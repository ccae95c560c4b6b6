package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MatryoshkaSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  // MRL-shaped fixture: early coordinates carry the structure (two
  // clusters separated in dims 0-3), late coordinates small noise.
  private def corpus = (0L until 40L).map { i =>
    val c = if (i % 2 == 0) 1.0f else -1.0f
    val v = Array.tabulate(dim)(d =>
      if (d < 4) c + 0.01f * ((i * (d + 3)) % 7)
      else 0.001f * ((i * (d + 1)) % 11))
    (i, v)
  }.toDF("vec_id", "embedding")

  private def queries = corpus.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def brute(k: Int) = {
    val q = queries
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("neighbor"),
        BinaryQuantizer.l2(col("qv"), col("embedding")).as("dist"))
    Dedup.topKPerKey(scored, Seq("qid"),
      Seq(col("dist").asc, col("neighbor").asc), k)
      .select("qid", "neighbor", "dist")
  }

  test("full-width prefix (dims = dim) refined search IS exact search") {
    val got = Matryoshka.searchRefined(corpus, "vec_id", "embedding",
        queries, "qid", "qv", dims = dim, dim = dim, k = 3, refine = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = brute(3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("served distances are exact full-dim L2 even from a 4-dim prefix") {
    val got = Matryoshka.searchRefined(corpus, "vec_id", "embedding",
        queries, "qid", "qv", dims = 4, dim = dim, k = 3, refine = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = brute(39)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case (key, d) =>
      assert(d === exact(key), s"dist for $key must be the exact L2")
    }
  }

  test("prefix stage scores only the prefix (pdist = L2 over first dims)") {
    val one = Matryoshka.search(corpus, "vec_id", "embedding",
        queries.filter(col("qid") === 0L), "qid", "qv", dims = 4, k = 39)
      .filter(col("neighbor") === 1L).collect().head.getDouble(2)
    val rows = corpus.filter(col("vec_id") isin (0L, 1L))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    val want = (0 until 4).map(i =>
      (rows(0)(i).toDouble - rows(1)(i).toDouble) *
        (rows(0)(i).toDouble - rows(1)(i).toDouble)).sum
    assert(math.abs(one - want) < 1e-12)
  }

  test("4-of-8 prefix with modest refine reaches exact top-k on the " +
      "MRL-shaped fixture (the truncation-works claim)") {
    val got = Matryoshka.searchRefined(corpus, "vec_id", "embedding",
        queries, "qid", "qv", dims = 4, dim = dim, k = 3, refine = 4)
      .select("qid", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute(3).select("qid", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }
}
