package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Text

class SimHashIndexSpec extends SparkTestBase {

  private def docs = graft.sources.Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"),
      transform(Text.tokens(col("text")),
        s => (Text.charHash(s) * lit(2654435761L)) % lit(4294967296L))
        .as("hs"))

  private def base = docs.filter(col("doc_id") % 10 =!= 7)
  private def delta = docs.filter(col("doc_id") % 10 === 7)

  /** Driver-side brute Hamming ball over the engine fingerprints — the
    * recall yardstick the banded probe must EQUAL (pigeonhole: any pair
    * within radius 2 shares one of the 3 bands, and the verify filter
    * removes everything wider — so banded ≡ brute, not ⊆).
    */
  private def bruteBall(r: Int): Set[(Long, Long, Int)] = {
    val fp = SimHashIndex.fingerprints(docs, "doc_id", "hs")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val (d, c) = fp.partition(_._1 % 10 == 7)
    (for {
      (did, dh) <- d
      (cid, ch) <- c
      ham = java.lang.Long.bitCount(dh ^ ch)
      if ham <= r
    } yield (did, cid, ham)).toSet
  }

  test("banded probe equals the brute Hamming ball at the guaranteed " +
      "radius") {
    val path = graft.Scratch.fresh("simhash_exact") + "/idx"
    SimHashIndex.write(base, "doc_id", "hs", path)
    val got = SimHashIndex.candidates(spark, path, delta, "doc_id", "hs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = bruteBall(2)
    assert(got === want, s"banded=${got.size} brute=${want.size}")
    assert(want.nonEmpty, "fixture has no Hamming-2 cross-split pairs")
  }

  test("identical documents collide at hamming 0 through every band") {
    import spark.implicits._
    val path = graft.Scratch.fresh("simhash_identical") + "/idx"
    val twin = base.limit(1).select(lit(999999L).as("doc_id"), col("hs"))
    SimHashIndex.write(base, "doc_id", "hs", path)
    val hit = SimHashIndex.candidates(spark, path, twin, "doc_id", "hs")
      .filter(col("hamming") === 0).count()
    assert(hit >= 1L, "an identical twin must collide at hamming 0")
  }

  test("deletes mask immediately, readmission clears the marker, " +
      "compact applies physically") {
    import spark.implicits._
    val path = graft.Scratch.fresh("simhash_lifecycle") + "/idx"
    SimHashIndex.write(base, "doc_id", "hs", path)
    val all = SimHashIndex.candidates(spark, path, delta, "doc_id", "hs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.nonEmpty)
    val victim = all.map(_._2).min
    SimHashIndex.delete(spark, path, Seq(victim).toDF("doc_id"), "doc_id")
    val masked = SimHashIndex.candidates(spark, path, delta, "doc_id", "hs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(masked === all.filterNot(_._2 == victim),
      "a forgotten doc must stop colliding immediately")
    assert(SimHashIndex.tombstones(spark, path).isDefined)
    // compact applies the delete physically and clears the marker
    SimHashIndex.compact(spark, path, "doc_id")
    assert(SimHashIndex.tombstones(spark, path).isEmpty)
    assert(!spark.read.parquet(path).filter(col("doc_id") === victim)
      .head(1).nonEmpty, "compaction must drop the forgotten band rows")
    assert(SimHashIndex.candidates(spark, path, delta, "doc_id", "hs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === masked)
    // readmission: the append clears a fresh marker and the doc serves
    SimHashIndex.delete(spark, path, Seq(victim).toDF("doc_id"), "doc_id")
    SimHashIndex.append(base.filter(col("doc_id") === victim), "doc_id",
      "hs", path)
    assert(SimHashIndex.tombstones(spark, path).isEmpty,
      "readmission must clear the stale marker")
    assert(SimHashIndex.candidates(spark, path, delta, "doc_id", "hs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === all,
      "a readmitted doc must serve its new band rows")
  }

  test("append is O(|batch|): band rows land as new files, content " +
      "equals a from-scratch build") {
    val path1 = graft.Scratch.fresh("simhash_append1") + "/idx"
    val path2 = graft.Scratch.fresh("simhash_append2") + "/idx"
    val w1 = base.filter(col("doc_id") % 3 =!= 0)
    val w2 = base.filter(col("doc_id") % 3 === 0)
    SimHashIndex.write(w1, "doc_id", "hs", path1)
    SimHashIndex.append(w2, "doc_id", "hs", path1)
    SimHashIndex.write(base, "doc_id", "hs", path2)
    def rows(p: String) = spark.read.parquet(p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(rows(path1) === rows(path2))
  }
}
