package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Vectors

/** Driver-side centroid state shared by the k-means-based ANN operators
  * ([[IvfAnn]], [[ProductQuantizer]]).
  *
  * A trained quantizer is O(k·dim) floats BY CONSTRUCTION — coarse IVF
  * sizing keeps `clusters ≈ √n` (16 k cells × 1 k dims ≈ 64 MB at the
  * extreme), and PQ codebooks are `m · codes · dim/m = codes · dim`
  * (kilobytes) — so the centroid table is "small state" in the same sense
  * as a broadcast dim table, and the right home for it during training is
  * the driver, exactly like Spark MLlib's `KMeans` (which collects and
  * re-broadcasts cluster centers every Lloyd iteration). Holding it as a
  * DataFrame instead forced a `localCheckpoint` per iteration plus an
  * argmin `groupBy` + join-back shuffle of the FULL corpus — several job
  * rounds of fixed overhead that dominated the training-tier benchmarks.
  *
  * With the state local, per-row operations (assign / encode / probe)
  * become pure array EXPRESSIONS over a literal centroid table: zero
  * shuffle, zero extra scans, fully codegen-friendly, and each Lloyd
  * iteration is exactly one corpus scan feeding one partial-aggregated
  * `groupBy` whose output (k·dim tiny rows) is collected.
  *
  * Bit-exactness contract (what keeps the DuckDB oracles hash-green):
  * means are still computed in Spark via the decimal-exact
  * [[graft.functions.Stable.sumD]] path and narrowed double→float the
  * same way `cast("float")` does; `cnorm2` replays the
  * [[graft.expressions.DotProduct]] kernel's left-to-right double fold;
  * argmin/tie-break semantics are `array_min` over `struct(score, cell)`
  * — the identical lexicographic struct ordering `min(struct(...))` used.
  */
private[operators] object CentroidState {

  /** One centroid; `cnorm2` replays DotProduct's left fold exactly. */
  final case class Cent(cell: Int, cvec: Array[Float]) {
    val cnorm2: Double = {
      var acc = 0.0
      var i = 0
      while (i < cvec.length) {
        acc += cvec(i).toDouble * cvec(i).toDouble
        i += 1
      }
      acc
    }
  }

  val schema: StructType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("cvec", ArrayType(FloatType, containsNull = false),
      nullable = false),
    StructField("cnorm2", DoubleType, nullable = false)))

  /** Literal centroid table: `array<struct<cell,cvec,cnorm2>>`. */
  def toLit(cents: Seq[Cent]): Column =
    array(cents.map(c =>
      struct(lit(c.cell).as("cell"),
        typedlit(c.cvec.toSeq).as("cvec"),
        lit(c.cnorm2).as("cnorm2"))): _*)

  /** Squared-distance rank score `|c|² − 2·v·c` (`|v|²` drops out of the
    * comparison) paired with the cell id — `array_min`/`array_sort` over
    * these structs IS the deterministic argmin with ties toward the
    * lower cell id.
    */
  def scoredCells(vec: Column, centsArr: Column): Column =
    transform(centsArr, c =>
      struct((c.getField("cnorm2")
        - lit(2.0) * Vectors.dot(vec, c.getField("cvec"))).as("score"),
        c.getField("cell").as("cell")))

  /** Nearest cell id for `vec` — the codegen
    * [[graft.expressions.NearestCell]] kernel (the centroid table rides
    * along as a JVM reference object, so plan size stays constant in
    * `clusters`); [[nearestCellHof]] is the pure-expression reference
    * formulation, bit-identical, kept for the equivalence tests.
    */
  def nearestCell(vec: Column, cents: Seq[Cent]): Column =
    graft.expressions.NearestCell.column(vec,
      cents.map(_.cell).toArray, cents.map(_.cvec).toArray,
      cents.map(_.cnorm2).toArray)

  def nearestCellHof(vec: Column, cents: Seq[Cent]): Column =
    array_min(scoredCells(vec, toLit(cents))).getField("cell")

  /** `map<cell, cvec>` literal — O(clusters·dim) driver state; lets a
    * residual `v − c(cell)` compute as a pure expression
    * (`zip_with(vec, element_at(map, cell), _ - _)`). The per-row map
    * lookup is a linear scan over `clusters` entries — the same
    * O(clusters·dim) per row the assignment kernel already pays.
    */
  def cvecMap(cents: Seq[Cent]): Column =
    map_from_entries(transform(toLit(cents),
      c => struct(c.getField("cell"), c.getField("cvec"))))

  /** The `nProbe` nearest cell ids, nearest first. Query-side only
    * (`queries · clusters` evaluations), so the expression formulation
    * is kept — it shares `scoredCells` with the [[nearestCellHof]]
    * reference path.
    */
  def nearestCells(vec: Column, cents: Seq[Cent], nProbe: Int): Column =
    transform(slice(array_sort(scoredCells(vec, toLit(cents))), 1, nProbe),
      s => s.getField("cell"))

  /** Rebuild centroids from collected `(cell, pos, mu)` mean rows; the
    * double→float narrowing matches Spark's `cast("float")`.
    */
  def fromMeans(rows: Seq[Row]): Seq[Cent] =
    rows.groupBy(_.getInt(0)).toSeq.map { case (cell, rs) =>
      Cent(cell, rs.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toArray)
    }.sortBy(_.cell)

  /** Publish driver state as the operators' public (cell, cvec, cnorm2)
    * DataFrame shape (a `LocalRelation` — broadcast- and join-friendly).
    */
  def toDF(spark: SparkSession, cents: Seq[Cent]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(cents.map(c =>
        Row(c.cell, c.cvec.toSeq, c.cnorm2)): _*),
      schema)

  /** Persist `df` unless a caller already did (e.g. [[ProductQuantizer
    * .searchRefined]] hands its cached corpus to `search`) — avoids the
    * double-cache warning and keeps one owner per cache entry.
    * Cache ownership: the plans built on top reference this cache
    * lazily, so operators cannot unpersist before the caller
    * materializes — the persist registers in [[graft.CacheScope]], and
    * callers release it after materializing
    * (`graft.CacheScope.releaseAll()`, as the gate runners do;
    * `CacheScopeSpec` pins that nothing stays cached after release).
    */
  def ensureCached(df: DataFrame): DataFrame =
    graft.CacheScope.cache(df)

  /** Re-collect a centroid DataFrame (small by the O(k·dim) contract)
    * back into driver state; `cnorm2` is re-derived so any caller-built
    * table gets the same left-fold value the expressions assume.
    */
  def collect(cents: DataFrame): Seq[Cent] =
    cents.select(col("cell").cast("int"), col("cvec"))
      .collect()
      .map(r => Cent(r.getInt(0), r.getSeq[Float](1).toArray))
      .toSeq.sortBy(_.cell)
}
