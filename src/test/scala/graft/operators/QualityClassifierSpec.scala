package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // Vocabulary chosen so pos/neg tokens land in distinct buckets.
  private val posDocs = Seq(
    (0L, "alpha beta gamma alpha"), (2L, "alpha gamma delta"))
  private val negDocs = Seq(
    (4L, "zork quux blarg"), (6L, "quux blarg blarg zork"))

  private def docs = (posDocs ++ negDocs).toDF("doc_id", "text")
  private def labels = (posDocs.map(_._1 -> true) ++
    negDocs.map(_._1 -> false)).toDF("doc_id", "label")

  test("class-separating vocabulary yields sign-separated scores") {
    val feats = QualityClassifier.features(docs, "doc_id", "text")
    val model = QualityClassifier.train(feats, labels, "doc_id", "label")
    val tot = QualityClassifier.classTotals(feats, labels, "doc_id", "label")
    val held = Seq((1L, "alpha gamma"), (3L, "zork blarg"))
      .toDF("doc_id", "text")
    val sc = QualityClassifier
      .score(QualityClassifier.features(held, "doc_id", "text"), model, tot,
        "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sc(1L) > 0.0, "positive-vocabulary doc must score positive")
    assert(sc(3L) < 0.0, "negative-vocabulary doc must score negative")
  }

  test("unseen buckets flow through the same smoothing (score defined)") {
    val feats = QualityClassifier.features(docs, "doc_id", "text")
    val model = QualityClassifier.train(feats, labels, "doc_id", "label")
    val tot = QualityClassifier.classTotals(feats, labels, "doc_id", "label")
    val held = Seq((9L, "neverseen tokens entirely")).toDF("doc_id", "text")
    val rows = QualityClassifier
      .score(QualityClassifier.features(held, "doc_id", "text"), model, tot,
        "doc_id").collect()
    assert(rows.length === 1)
    assert(!rows.head.isNullAt(2), "unseen-vocab score must not be null")
    // cp = cn = 0 → per-token weight = log10(1/(ptot+B)) - log10(1/(ntot+B))
    val w = math.log10(1.0 / (7 + QualityClassifier.Buckets)) -
      math.log10(1.0 / (7 + QualityClassifier.Buckets))
    assert(math.abs(rows.head.getDouble(2) - 3 * w) < 1e-9)
  }

  test("write → append → forget ≡ fresh train on the surviving set " +
      "(integer-exact model maintenance)") {
    withTempDir("nbmodel") { dir =>
      val baseF = QualityClassifier.features(docs, "doc_id", "text")
      val extra = Seq((8L, "alpha blarg gamma")).toDF("doc_id", "text")
      val extraL = Seq((8L, true)).toDF("doc_id", "label")
      val idx = s"$dir/m"
      QualityClassifier.writeModel(idx, baseF, labels, "doc_id", "label")
      QualityClassifier.appendModel(spark, idx,
        QualityClassifier.features(extra, "doc_id", "text"), extraL,
        "doc_id", "label")
      // forget one base doc (doc 4: "zork quux blarg")
      val f4 = QualityClassifier.features(
        docs.filter(col("doc_id") === 4L), "doc_id", "text")
      QualityClassifier.forgetModel(spark, idx, f4,
        labels.filter(col("doc_id") === 4L), "doc_id", "label")
      val maintained = QualityClassifier.readCounts(spark, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // fresh train over (base ∪ extra) \ doc4
      val survivors = docs.filter(col("doc_id") =!= 4L)
        .unionByName(extra)
      val survivorLabels = labels.filter(col("doc_id") =!= 4L)
        .unionByName(extraL)
      val fresh = QualityClassifier.train(
          QualityClassifier.features(survivors, "doc_id", "text"),
          survivorLabels, "doc_id", "label")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(maintained === fresh)
      // ptot: docs 0+2+8 = 4+3+3 pos tokens; ntot: doc 6 only (doc 4
      // forgotten); pdocs 3, ndocs 1
      val tot = QualityClassifier.readTotals(spark, idx).collect().head
      assert((tot.getAs[Long]("ptot"), tot.getAs[Long]("ntot"),
        tot.getAs[Long]("pdocs"), tot.getAs[Long]("ndocs"))
        === (10L, 4L, 3L, 1L))
    }
  }

  test("every publish is ONE snapshot version holding BOTH artifacts " +
      "(no counts-new/totals-stale window)") {
    withTempDir("nbatomic") { dir =>
      val idx = s"$dir/m"
      val baseF = QualityClassifier.features(docs, "doc_id", "text")
      QualityClassifier.writeModel(idx, baseF, labels, "doc_id", "label")
      val extra = Seq((8L, "alpha blarg")).toDF("doc_id", "text")
      QualityClassifier.appendModel(spark, idx,
        QualityClassifier.features(extra, "doc_id", "text"),
        Seq((8L, true)).toDF("doc_id", "label"), "doc_id", "label")
      // one version per publish; each version carries counts AND totals
      assert(graft.sources.Snapshots.latestVersion(spark, idx) === Some(1L))
      Seq(0L, 1L).foreach { v =>
        val vp = graft.sources.Snapshots.versionPath(idx, v)
        assert(new java.io.File(s"$vp/counts").isDirectory, s"counts v$v")
        assert(new java.io.File(s"$vp/totals").isDirectory, s"totals v$v")
      }
    }
  }

  test("scores are invariant to corpus partitioning (decimal grid)") {
    val feats = QualityClassifier.features(docs, "doc_id", "text")
    val model = QualityClassifier.train(feats, labels, "doc_id", "label")
    val tot = QualityClassifier.classTotals(feats, labels, "doc_id", "label")
    val held = Seq((1L, "alpha zork gamma blarg quux delta"))
      .toDF("doc_id", "text")
    def run(parts: Int) = QualityClassifier
      .score(QualityClassifier.features(held, "doc_id", "text")
        .repartition(parts), model, tot, "doc_id")
      .collect().head.getDouble(2)
    assert(run(1) === run(7))
  }
}
