package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns (north-star
  * similarity tier). All double-precision, strictly left-to-right folds —
  * `aggregate(zip_with(...))` — so the DuckDB oracle
  * (`list_sum(list_transform(range(...), ...))`, also a naive left fold)
  * reproduces results bit-for-bit. Everything is per-row scalar expression
  * work: codegen-friendly, no UDF, no shuffle.
  */
object Vectors {

  /** Dot product in double precision, left-to-right accumulation.
    * Dispatches to the codegen [[graft.expressions.DotProduct]] kernel;
    * [[dotHof]] is the pure-`functions._` reference implementation
    * (bit-identical, kept for the property tests).
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.NativeKernels.dotProduct(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane-style LSH bucket from the signs of the first
    * `bits` components (axis-aligned hyperplanes — deterministic, no
    * stored projection matrix; the standard trick when the embedding is
    * already whitened). 2^bits buckets.
    */
  def signBucket(vecCol: String, bits: Int): Column =
    expr(s"""aggregate(sequence(0, ${bits - 1}), 0L,
            |  (acc, i) -> acc + IF(element_at($vecCol, i + 1) >= 0F,
            |                       shiftleft(1L, i), 0L))""".stripMargin)

  /** DuckDB mirrors (same arithmetic, same fold order). */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  def signBucketSql(a: String, bits: Int): String =
    s"CAST(list_sum([CASE WHEN $a[i] >= 0 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END FOR i IN range(1, ${bits + 1})]) AS BIGINT)"
}
