package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** IVF (inverted-file) approximate nearest neighbour — the scale path
  * past sign-bucket LSH (SCALING.md "Dedup / similarity"): a coarse
  * k-means quantizer partitions the corpus into cells; each query scores
  * only its `nProbe` nearest cells instead of the full corpus, so scored
  * pairs track `nProbe / clusters` of brute force while recall stays
  * high for clustered data.
  *
  * Everything is DataFrame algebra — no RDDs, no driver-side vectors:
  *
  *  - seeding is deterministic (the `clusters` lowest-id vectors), so
  *    re-runs build the same index — no `rand()`, reproducible like every
  *    other operator here;
  *  - each Lloyd iteration is assign (cross join against the broadcast
  *    centroid table, argmin via one `min(struct)` aggregate — no window)
  *    then update (posexplode → per-(cell, dim) mean → array rebuild);
  *    iterations are a FIXED count, the batch analog of "train for n
  *    steps", so the plan size is bounded;
  *  - search reuses the custom [[graft.plans.TopKPerKeyPlan]] operator
  *    for both the query→cells probe assignment and the final top-k, so
  *    the map-side bounded-heap reduction applies before every shuffle.
  *
  * At 10 B vectors: centroids are O(clusters·dim) — always broadcast;
  * the corpus is written bucketed by cell so a probe reads `nProbe`
  * buckets; raising `clusters` keeps cell size constant as the corpus
  * grows (clusters ≈ sqrt(n) is the classical sizing).
  */
object IvfAnn {

  /** Squared-distance argmin only needs `|c|² − 2·v·c` — `|v|²` is
    * constant per vector and drops out of the comparison.
    */
  private def cellScore = {
    (vec: org.apache.spark.sql.Column, cvec: org.apache.spark.sql.Column,
        cnorm2: org.apache.spark.sql.Column) =>
      cnorm2 - lit(2.0) * Vectors.dot(vec, cvec)
  }

  /** Train the coarse quantizer: (cell, cvec, cnorm2). */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
      clusters: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import org.apache.spark.sql.expressions.Window
    // deterministic seeds: the `clusters` lowest-id vectors
    var cents = corpus
      .orderBy(col(idCol)).limit(clusters)
      .select(row_number().over(Window.orderBy(col(idCol))).cast("int")
          .as("cell"),
        col(vecCol).as("cvec"))
      .withColumn("cnorm2", Vectors.dot(col("cvec"), col("cvec")))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val assigned = assign(corpus, cents, idCol, vecCol)
        .join(corpus.select(col(idCol), col(vecCol)), idCol)
      val next = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        // decimal-backed mean (Stable rationale): centroids come out
        // bit-identical regardless of partitioning, so the trained index
        // is reproducible run to run
        .agg((graft.functions.Stable.sumD(col("x")) / count(col("x")))
          .as("m"))
        .groupBy(col("cell"))
        // rebuild the vector ordered by dimension; struct sort orders by
        // the leading `pos` field, making collect_list's order irrelevant
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("cvec"))
        .withColumn("cnorm2", Vectors.dot(col("cvec"), col("cvec")))
        .localCheckpoint(true)
      cents = next
      i += 1
    }
    cents
  }

  /** Hard assignment: one cell per vector, argmin of the cell score via a
    * single `min(struct)` aggregate (ties break toward the lower cell id).
    */
  def assign(vecs: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .select(col(idCol),
        struct(cellScore(col(vecCol), col("cvec"), col("cnorm2"))
          .as("score"), col("cell")).as("sc"))
      .groupBy(col(idCol))
      .agg(min(col("sc")).getField("cell").as("cell"))

  /** Probe assignment: each query's `nProbe` nearest cells — the same
    * scoring, ranked through the custom top-k operator.
    */
  def probes(queries: DataFrame, cents: DataFrame, qidCol: String,
      qvecCol: String, nProbe: Int): DataFrame =
    Dedup.topKPerKey(
      queries.select(col(qidCol), col(qvecCol))
        .crossJoin(broadcast(cents))
        .select(col(qidCol), col("cell"),
          cellScore(col(qvecCol), col("cvec"), col("cnorm2")).as("score")),
      keys = Seq(qidCol),
      order = Seq(col("score").asc, col("cell").asc),
      k = nProbe)
      .select(col(qidCol), col("cell"))

  /** End-to-end IVF search: top-`k` cosine neighbours per query scored
    * only inside the query's probed cells.
    *
    * @return (qid, neighbor, cosine)
    */
  def search(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, clusters: Int, nProbe: Int, iters: Int = 2): DataFrame = {
    // the corpus feeds seeding, every Lloyd iteration (assign + rebuild),
    // final assignment, and the probe scoring — persist once instead of
    // re-running the scan for each of those jobs
    val corpus = corpus0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = centroids(corpus, idCol, vecCol, clusters, iters)
    val cells = assign(corpus, cents, idCol, vecCol)
    val corpusByCell = corpus
      .select(col(idCol), col(vecCol), Vectors.norm(col(vecCol)).as("__n"))
      .join(cells, idCol)
    val probed = probes(queries, cents, qidCol, qvecCol, nProbe)
      .join(queries.select(col(qidCol), col(qvecCol),
        Vectors.norm(col(qvecCol)).as("__qn")), qidCol)
    val scored = probed.join(corpusByCell, "cell")
      .filter(col(qidCol) =!= col(idCol) && col("__qn") > 0 && col("__n") > 0)
      .select(col(qidCol), col(idCol).as("neighbor"),
        (Vectors.dot(col(qvecCol), col(vecCol)) / (col("__qn") * col("__n")))
          .as("cosine"))
    Dedup.topKPerKey(scored, Seq(qidCol),
      Seq(col("cosine").desc, col("neighbor").asc), k)
  }
}
