package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** MinHash + banded LSH near-duplicate detection (north-star dedup tier).
  *
  * Pipeline shape: per-row signature computation is pure scalar expression
  * work (one scan, codegen, no shuffle); the LSH bucket self-join shuffles
  * on (band, bucket-hash) — the ONLY quadratic-risk step, bounded by bucket
  * collisions instead of n² — and the verify step joins shingle sets back
  * by doc id. At 100 TB this is the textbook scale path: candidate
  * generation cost tracks the number of true near-dup pairs, not the
  * corpus size squared.
  *
  * All hashing is the portable `(h*31 + c) % 1000000007` polynomial from
  * [[graft.functions.Text]] composed with per-function affine maps
  * `(a_j·x + b_j) % P`, so a DuckDB oracle can reproduce signatures
  * bit-for-bit (constants exposed via [[sqlConstants]]).
  */
object MinHashLSH {

  val P: Long = Text.HashP
  /** Signature length and banding: k = bands × rowsPerBand. */
  val K = 16
  val Bands = 4
  val RowsPerBand = 4

  /** Affine hash-function constants, deterministic and nonzero mod P. */
  val A: Seq[Long] = (1 to K).map(j => (j * 1103515245L) % P)
  val B: Seq[Long] = (1 to K).map(j => (j * 12345L) % P)

  /** Word n-gram shingles from a token array; documents shorter than n
    * tokens contribute their whole token sequence as one shingle.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))

  /** Distinct portable hashes of the shingle set. Dispatches to the
    * codegen [[graft.expressions.ShingleHashes]] kernel;
    * [[shingleHashesHof]] is the pure-`functions._` reference
    * (bit-identical, kept for the property tests).
    */
  def shingleHashes(toks: Column, n: Int): Column =
    graft.expressions.NativeKernels.shingleHashes(toks, n)

  def shingleHashesHof(toks: Column, n: Int): Column =
    array_distinct(transform(wordShingles(toks, n), Text.charHash(_)))

  /** k-component MinHash signature over a shingle-hash array column.
    * Dispatches to the codegen [[graft.expressions.MinHashSignature]]
    * kernel; [[signatureHof]] is the pure-`functions._` reference
    * (bit-identical, kept for the property tests).
    */
  def signature(shHashes: Column): Column =
    graft.expressions.NativeKernels.minhashSignature(shHashes, A, B, P)

  def signatureHof(shHashes: Column): Column =
    array((0 until K).map { j =>
      array_min(transform(shHashes,
        x => (lit(A(j)) * x + lit(B(j))) % lit(P)))
    }: _*)

  /** Exact Jaccard between two distinct-element arrays using
    * |∩| / (|a|+|b|-|∩|) — avoids needing a union primitive.
    */
  def jaccard(a: Column, b: Column): Column = {
    val common = size(array_intersect(a, b)).cast("double")
    common / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Signature agreement fraction — the MinHash Jaccard estimate. */
  def estimatedJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / lit(K)

  /** doc_id + shingle hashes + signature → verified near-dup pairs.
    *
    * @param docs frame with `idCol`, `shCol` (distinct shingle hashes)
    * @return (id1, id2, est_jaccard, jaccard) for candidates whose exact
    *         Jaccard ≥ threshold, id1 < id2
    */
  def nearDupPairs(docs: DataFrame, idCol: String, shCol: String,
      threshold: Double): DataFrame = {
    // persisted: the signature frame feeds the bucket explode AND both
    // sides of the verify join — without it Spark recomputes shingles +
    // signatures three times (Spark's own ML LSH models cache the same way)
    val withSig = docs.withColumn("__sig", signature(col(shCol)))
      .transform(graft.CacheScope.cache)
    // band buckets: (band index, joined signature slice)
    val buckets = withSig.select(col(idCol), explode(
      array((0 until Bands).map { bIdx =>
        struct(lit(bIdx).as("band"),
          array_join(slice(col("__sig"), bIdx * RowsPerBand + 1, RowsPerBand), "_")
            .as("bucket"))
      }: _*)).as("bk"))
    // explicit aliases: l/r derive from the same plan, so l("band") ===
    // r("band") would resolve both sides to one attribute (Spark warns
    // "trivially true equals predicate" and falls back to positional
    // disambiguation — correct today, but fragile under optimizer changes)
    val flat = buckets.select(col(idCol).as("id"),
      col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val candidates = flat.as("l").join(flat.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2")).distinct()
    val a = withSig.select(col(idCol).as("id1"),
      col(shCol).as("__sh1"), col("__sig").as("__sig1"))
    val b = withSig.select(col(idCol).as("id2"),
      col(shCol).as("__sh2"), col("__sig").as("__sig2"))
    candidates.join(a, "id1").join(b, "id2")
      .select(col("id1"), col("id2"),
        estimatedJaccard(col("__sig1"), col("__sig2")).as("est_jaccard"),
        jaccard(col("__sh1"), col("__sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The signature expression as DuckDB SQL over a column named `sh`
    * (list of BIGINT shingle hashes) — same constants, same arithmetic.
    */
  def signatureSql(sh: String = "sh"): String =
    (0 until K).map { j =>
      s"list_min(list_transform($sh, x -> (${A(j)} * x + ${B(j)}) % $P))"
    }.mkString("[", ", ", "]")
}
