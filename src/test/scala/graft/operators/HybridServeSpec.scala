package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the q182 contract: hybrid retrieval served from the PERSISTED
  * indexes, with deletes masked in BOTH legs and neither leg's probe
  * paying a corpus-side exchange.
  */
class HybridServeSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  // ids 0..9; doc 0 and vector 0 are the query; id 7 gets deleted
  private def docs = Seq(
    (0L, "red apple pie"), (1L, "red apple tart"), (2L, "green pear"),
    (3L, "apple pie crust"), (4L, "plain bread"), (5L, "red pie"),
    (6L, "pear tart"), (7L, "red apple pie tart"), (8L, "rice"),
    (9L, "apple")).toDF("doc_id", "text")

  private def vecs = {
    // vector i = unit-ish bump at position i%4 plus a doc_id ramp so
    // neighbors are deterministic; id 7 made the closest to 0 so the
    // delete visibly changes the answer
    val rows = (0L to 9L).map { i =>
      val v = Array.tabulate(dim)(j =>
        (if (j == (i % 4).toInt) 1.0f else 0.0f) + 0.01f * i)
      (i, if (i == 7L) Array.tabulate(dim)(j =>
        (if (j == 0) 1.0f else 0.0f) + 0.001f) else v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def buildIndexes(root: String): (String, String) = {
    val tIdx = s"$root/text"
    val bIdx = s"$root/bq"
    TextIndex.write(docs, "doc_id", "text", tIdx)
    TextIndex.delete(spark, tIdx, Seq(7L).toDF("doc_id"), "doc_id")
    BinaryQuantizer.writeIndex(vecs, "vec_id", "embedding", bIdx)
    BinaryQuantizer.deleteFromIndex(spark, bIdx,
      Seq(7L).toDF("vec_id"), "vec_id")
    (tIdx, bIdx)
  }

  private def bmLeg(tIdx: String): DataFrame =
    TextIndex.searchTopK(spark, tIdx,
        docs.filter(col("doc_id") === 0L)
          .select(col("doc_id").as("qid"), col("text")),
        "qid", "text", k = 5)
      .select(col("qid"), col("doc_id"), col("rank").as("rk"))

  private def vLeg(bIdx: String): DataFrame =
    BinaryQuantizer.searchIndexRefined(spark, bIdx, vecs,
        "vec_id", "embedding",
        vecs.filter(col("vec_id") === 0L)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid", "qv", k = 5, refine = 2)
      .withColumn("rk", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("dist"), col("neighbor"))).cast("long"))
      .select(col("qid"), col("neighbor").as("doc_id"), col("rk"))

  private def fused(tIdx: String, bIdx: String): DataFrame = {
    val contrib = (f: DataFrame) => f.select(col("qid"), col("doc_id"),
      (lit(1.0) / (lit(60L) + col("rk")).cast("double")).as("c"))
    contrib(bmLeg(tIdx)).unionByName(contrib(vLeg(bIdx)))
      .groupBy(col("qid"), col("doc_id"))
      .agg(graft.functions.Stable.sumD(col("c")).as("rrf"))
  }

  test("deleted ids are masked in BOTH legs of the fused result") {
    withTempDir("hybrid") { root =>
      val (tIdx, bIdx) = buildIndexes(root)
      // doc 7 matches the text query on every term and vector 7 is the
      // nearest neighbor — without masking it tops both legs
      val bm = bmLeg(tIdx).collect().map(_.getLong(1)).toSet
      val v = vLeg(bIdx).collect().map(_.getLong(1)).toSet
      assert(!bm.contains(7L), s"text leg leaked the deleted doc: $bm")
      assert(!v.contains(7L), s"vector leg leaked the deleted doc: $v")
      val f = fused(tIdx, bIdx).collect().map(_.getLong(1)).toSet
      assert(!f.contains(7L) && f.nonEmpty)
      // a doc ranked in both legs fuses both contributions
      val both = bm.intersect(v)
      assert(both.nonEmpty, "fixture should overlap somewhere")
      graft.CacheScope.releaseAll()
    }
  }

  test("text-leg probe is partition-pruned; vector-leg probe never " +
      "sort-merge-joins or exchanges corpus-sized data") {
    withTempDir("hybridplan") { root =>
      val (tIdx, bIdx) = buildIndexes(root)
      // keyword leg: the postings scan carries the pushed bkt partition
      // filter (probe I/O tracks query vocabulary, not corpus size)
      val bmPlan = bmLeg(tIdx).queryExecution.executedPlan.toString
      assert(bmPlan.contains("PartitionFilters") && bmPlan.contains("bkt"),
        bmPlan.take(2000))
      // vector leg: codes scan feeds a broadcast-side probe and the
      // shortlist fetch broadcasts the BOUNDED id set against the
      // primary store — a SortMergeJoin anywhere means a corpus-sized
      // shuffle crept into the probe path
      val vPlan = vLeg(bIdx).queryExecution.executedPlan.toString
      assert(!vPlan.contains("SortMergeJoin"),
        s"corpus-side shuffle in the vector probe:\n${vPlan.take(3000)}")
      // the prefilter runs on the bounded-heap top-k operator, not a
      // full per-query sort of the scored corpus
      assert(vPlan.contains("TopKPerKey"), vPlan.take(2000))
      graft.CacheScope.releaseAll()
    }
  }
}
