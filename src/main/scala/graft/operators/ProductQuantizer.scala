package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Product quantization (PQ) — the memory-compression tier of the ANN
  * family (brute q27 → LSH q28 → IVF q58 → int8 q59 → PQ): each
  * `dim`-float vector splits into `m` subvectors, each subspace gets its
  * own small k-means codebook (reusing [[IvfAnn.centroids]] — same
  * deterministic seeding, same decimal-exact means), and a vector is
  * stored as `m` small codes. 64 floats (256 B) at m=8 become 8 codes —
  * 32× compression, the difference between an in-memory corpus and not
  * at 10 B vectors.
  *
  * Search is asymmetric distance computation (ADC): per query, the
  * distance from its subvector to EVERY codebook centroid is
  * precomputed (`m · k` numbers — tiny) and broadcast; a corpus row's
  * approximate distance is then `m` map lookups summed by a
  * higher-order function over its codes — one corpus scan, ZERO
  * shuffle before the final top-k (which runs through the bounded-heap
  * [[graft.plans.TopKPerKeyPlan]] operator).
  *
  * Tables are `map<cell,dist>` rather than position-indexed arrays
  * because Lloyd iterations can empty a cell: codebook cell ids stay a
  * sparse subset of `1..k` and a positional lookup would misalign.
  */
object ProductQuantizer {

  /** Per-subspace slice of `vec`: `[i*sub+1, (i+1)*sub]` (1-based). */
  private def subvectors(vec: Column, m: Int, dim: Int): Column = {
    val sub = dim / m
    transform(sequence(lit(0), lit(m - 1)),
      i => slice(vec, i * sub + 1, lit(sub)))
  }

  /** Train one codebook per subspace: (m, cell, cvec, cnorm2).
    *
    * JOINT training: all `m` subspaces run their Lloyd iterations in one
    * DataFrame pipeline keyed by (subspace, cell) — the exploded corpus
    * is scanned once per iteration instead of once per subspace per
    * iteration (m× fewer job rounds; it cut q67's bench time ~3×).
    * Semantics are identical to training each subspace independently
    * through [[IvfAnn.centroids]]: same lowest-id deterministic seeds,
    * same decimal-exact means, and subspaces never interact (every
    * aggregation is keyed by `m`).
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, k: Int, iters: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    import org.apache.spark.sql.expressions.Window
    val subvecs = corpus
      .select(col(idCol),
        posexplode(subvectors(col(vecCol), m, dim)).as(Seq("m", "sv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic seeds: the k lowest-id vectors seed cell 1..k in
    // EVERY subspace (their m-th slice) — matches IvfAnn's seeding
    val seedIds = corpus.select(col(idCol)).orderBy(col(idCol)).limit(k)
      .select(col(idCol),
        row_number().over(Window.orderBy(col(idCol))).cast("int").as("cell"))
    var cents = subvecs.join(broadcast(seedIds), idCol)
      .select(col("m"), col("cell"), col("sv").as("cvec"))
      .withColumn("cnorm2", Vectors.dot(col("cvec"), col("cvec")))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val assigned = subvecs.join(broadcast(cents), "m")
        .select(col(idCol), col("m"),
          struct((col("cnorm2")
            - lit(2.0) * Vectors.dot(col("sv"), col("cvec"))).as("score"),
            col("cell")).as("sc"))
        .groupBy(col(idCol), col("m"))
        .agg(min(col("sc")).getField("cell").as("cell"))
        .join(subvecs, Seq(idCol, "m"))
      cents = assigned
        .select(col("m"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("cell"), col("pos"))
        // decimal-backed mean (Stable rationale): codebooks come out
        // bit-identical regardless of partitioning
        .agg((graft.functions.Stable.sumD(col("x")) / count(col("x")))
          .as("mu"))
        .groupBy(col("m"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
          s => s.getField("mu").cast("float")).as("cvec"))
        .withColumn("cnorm2", Vectors.dot(col("cvec"), col("cvec")))
        .localCheckpoint(true)
      i += 1
    }
    subvecs.unpersist()
    cents
  }

  /** Encode each vector as its `m` nearest-codeword cells: (id, codes).
    * One explode to (id, subspace, subvector), a broadcast argmin per
    * subspace, and an ordered array rebuild — the same shapes as
    * [[IvfAnn.assign]].
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int, dim: Int): DataFrame =
    corpus
      .select(col(idCol),
        posexplode(subvectors(col(vecCol), m, dim)).as(Seq("m", "sv")))
      .join(broadcast(codebook), "m")
      .select(col(idCol), col("m"),
        struct((col("cnorm2") - lit(2.0) * Vectors.dot(col("sv"), col("cvec")))
          .as("score"), col("cell")).as("sc"))
      .groupBy(col(idCol), col("m"))
      .agg(min(col("sc")).getField("cell").as("code"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** Per-query ADC tables: (qid, tables) with `tables[m][cell] =
    * ||q_m − c||²` as an array (over subspaces, in order) of maps.
    */
  def distTables(queries: DataFrame, qidCol: String, qvecCol: String,
      codebook: DataFrame, m: Int, dim: Int): DataFrame =
    queries
      .select(col(qidCol),
        posexplode(subvectors(col(qvecCol), m, dim)).as(Seq("m", "qsv")))
      .join(broadcast(codebook), "m")
      .select(col(qidCol), col("m"), col("cell"),
        (Vectors.dot(col("qsv"), col("qsv")) + col("cnorm2")
          - lit(2.0) * Vectors.dot(col("qsv"), col("cvec"))).as("d"))
      .groupBy(col(qidCol), col("m"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("cell"), col("d"))))).as("t"))
      .groupBy(col(qidCol))
      // comparator form: default struct ordering cannot compare the
      // nested map field, so order by the leading subspace index only
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("t"))),
          (l, r) => l.getField("m") - r.getField("m")),
        s => s.getField("t")).as("tables"))

  /** End-to-end PQ search: top-`k` neighbours per query by approximate
    * (ADC) squared L2 distance. @return (qid, neighbor, approx_dist)
    */
  def search(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, m: Int, dim: Int, codes: Int, iters: Int = 2): DataFrame = {
    val corpus = corpus0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codebook = train(corpus, idCol, vecCol, m, dim, codes, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val encoded = encode(corpus, idCol, vecCol, codebook, m, dim)
    val tables = distTables(queries, qidCol, qvecCol, codebook, m, dim)
    val scored = encoded.crossJoin(broadcast(tables))
      .filter(col(qidCol) =!= col(idCol))
      .select(col(qidCol), col(idCol).as("neighbor"),
        aggregate(
          zip_with(col("codes"), col("tables"), (c, t) => element_at(t, c)),
          lit(0.0), (acc, x) => acc + x).as("approx_dist"))
    Dedup.topKPerKey(scored, Seq(qidCol),
      Seq(col("approx_dist").asc, col("neighbor").asc), k)
  }

  /** PQ shortlist → EXACT re-rank — the production composition: ADC
    * over codes prunes the corpus to a `shortlist` of `refine · k`
    * candidates per query (codes-only scan, zero shuffle), then only
    * the shortlist's FULL vectors are fetched (a semi-join against the
    * corpus — at 10 B vectors this is the only stage touching float
    * data) and re-scored exactly. Approximation error then affects only
    * which candidates make the shortlist, not their final order.
    * @return (qid, neighbor, dist2) — exact squared L2
    */
  def searchRefined(corpus0: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, m: Int, dim: Int, codes: Int, iters: Int = 2,
      refine: Int = 4): DataFrame = {
    val corpus = corpus0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shortlist = search(corpus, idCol, vecCol, queries, qidCol, qvecCol,
      k = refine * k, m = m, dim = dim, codes = codes, iters = iters)
    val exact = shortlist
      .join(corpus.select(col(idCol).as("neighbor"), col(vecCol)), "neighbor")
      .join(queries.select(col(qidCol), col(qvecCol)), qidCol)
      .select(col(qidCol), col("neighbor"),
        (Vectors.dot(col(qvecCol), col(qvecCol))
          + Vectors.dot(col(vecCol), col(vecCol))
          - lit(2.0) * Vectors.dot(col(qvecCol), col(vecCol))).as("dist2"))
    Dedup.topKPerKey(exact, Seq(qidCol),
      Seq(col("dist2").asc, col("neighbor").asc), k)
  }
}
