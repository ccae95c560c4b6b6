package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The [[graft.expressions.NearestCell]] codegen kernel must be
  * bit-identical to the pure-expression argmin formulation
  * ([[CentroidState.nearestCellHof]]) — the ANN oracles were validated
  * against the latter's semantics. Compared on the real fixture, with a
  * trained centroid table, plus an adversarial tie case.
  */
class NearestCellSpec extends SparkTestBase {

  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def assertNoDiff(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.filter(!(col("a") <=> col("b")))
    assert(bad.count() === 0, bad.limit(5).collect().mkString("; "))
  }

  test("kernel == HOF argmin over every embedding with trained centroids") {
    val cents = IvfAnn.lloyd(embs.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", clusters = 16, iters = 1)
    assertNoDiff(embs.select(
      CentroidState.nearestCell(col("embedding"), cents).as("a"),
      CentroidState.nearestCellHof(col("embedding"), cents).as("b")))
  }

  test("equal scores tie toward the lower cell id in both formulations") {
    val cents = IvfAnn.lloyd(embs.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", clusters = 8, iters = 1)
    // duplicated centroid vectors under different cell ids: rows landing
    // on the duplicated vector must pick cell 3, never 7
    val dup = Seq(
      CentroidState.Cent(3, cents.head.cvec),
      CentroidState.Cent(7, cents.head.cvec)) ++
      cents.tail.map(c => c.copy(cell = c.cell + 100))
    assertNoDiff(embs.select(
      CentroidState.nearestCell(col("embedding"), dup).as("a"),
      CentroidState.nearestCellHof(col("embedding"), dup).as("b")))
    val picked = embs
      .select(CentroidState.nearestCell(col("embedding"), dup).as("c"))
      .filter(col("c") === 7).count()
    assert(picked === 0, "tie broke toward the higher cell id")
  }

  test("malformed input fails loudly instead of reading out of bounds") {
    import spark.implicits._
    val cents = Seq(CentroidState.Cent(1, Array(1.0f, 2.0f, 3.0f)))
    // shorter vector than the centroid dimension
    val short = Seq(Seq(1.0f, 2.0f)).toDF("embedding")
    val e1 = intercept[Exception] {
      short.select(CentroidState.nearestCell(col("embedding"), cents))
        .collect()
    }
    assert(exceptionChain(e1).exists(_.getMessage != null) &&
      exceptionChain(e1).exists(m => Option(m.getMessage)
        .exists(_.contains("nearest_cell"))), e1.toString)
    // null component inside the vector
    val holed = Seq(Seq[java.lang.Float](1.0f, null, 3.0f)).toDF("embedding")
    val e2 = intercept[Exception] {
      holed.select(CentroidState.nearestCell(col("embedding"), cents))
        .collect()
    }
    assert(exceptionChain(e2).exists(m => Option(m.getMessage)
      .exists(_.contains("null component"))), e2.toString)
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
}
