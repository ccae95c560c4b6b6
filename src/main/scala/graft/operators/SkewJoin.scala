package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 / the 100 TB design
  * note). AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one build-side key is so hot that even
  * split shuffle blocks overwhelm a task — the classic power-law join.
  *
  * Left rows get a deterministic salt in [0, factor) derived from a
  * row-distinguishing column (NOT the join key — that would put the whole
  * hot key in one salt bucket again); the right side is replicated once
  * per salt value. The join key becomes (key, salt), splitting each hot
  * key's rows across `factor` reducers. Result set is identical to the
  * unsalted join (asserted in the spec); cost is factor× replication of
  * the smaller side — use for large⋈medium where broadcast doesn't fit.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      saltSource: String, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val l = left.withColumn("__salt",
      pmod(hash(col(saltSource)), lit(factor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    // salting exists for the SHUFFLE join regime (a broadcastable right
    // side has no skew problem to solve); the hint pins that plan at any
    // test scale so what runs is what ships
    l.join(r.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
