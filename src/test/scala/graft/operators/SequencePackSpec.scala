package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SequencePackSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic doc lengths spanning the interesting shapes: shorter
  // than a sequence, exactly one sequence, multi-sequence, and zeros
  private def fixture = (0 until 500).map { i =>
    val n = i % 11 match {
      case 0 => 0L            // empty — must vanish from the packing
      case 1 => 16L           // small
      case 2 => 9L            // sequence length exactly (L = 9 below)
      case k => (k * 7 + i % 5).toLong
    }
    (i.toLong, n)
  }.toDF("doc_id", "n_tokens")

  test("PrefixSum.running equals the single-partition global window") {
    val got = PrefixSum.running(fixture, "doc_id", "n_tokens", "c", buckets = 7)
      .select(col("doc_id"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = fixture
      .withColumn("c", expr(
        "sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED " +
          "PRECEDING AND CURRENT ROW)"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === want)
  }

  test("PrefixSum is bucket-count independent (1, 3, 64 buckets agree)") {
    def run(b: Int) =
      PrefixSum.running(fixture, "doc_id", "n_tokens", "c", buckets = b)
        .select(col("doc_id"), col("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val one = run(1)
    assert(run(3) === one)
    assert(run(64) === one)
  }

  test("packing partitions every token exactly once") {
    val L = 9
    val packed = SequencePack.pack(fixture, "doc_id", "n_tokens", L, buckets = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // columns: seq_id, doc_id, n_tokens, start_off, end_off, tok_start, tok_len
    val totalTokens = fixture.agg(sum("n_tokens")).as[Long].head()

    // every token lands in exactly one contribution
    assert(packed.map(_._7).sum === totalTokens)
    // per-document: contributions are contiguous and sum to n_tokens
    packed.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._7).sum === rows.head._3)
      assert(rows.head._5 - rows.head._4 === rows.head._3)
    }
    // per-sequence: filled to exactly L except the last sequence
    val fills = packed.groupBy(_._1).view.mapValues(_.map(_._7).sum).toMap
    val lastSeq = fills.keys.max
    fills.foreach { case (seq, f) =>
      if (seq < lastSeq) assert(f === L, s"sequence $seq underfilled")
      else assert(f >= 1 && f <= L)
    }
    // in-sequence offsets stay inside [0, L)
    assert(packed.forall(r => r._6 >= 0 && r._6 < L && r._6 + r._7 <= L))
    // empty documents emit nothing
    assert(!packed.exists(_._3 == 0L))
  }

  // the persisted lifecycle admits only n_tokens > 0 rows (the frontier
  // is derived from contribution rows, which empty docs don't emit)
  private def packable = fixture.filter(col("n_tokens") > 0)

  test("persisted lifecycle: base + appends equals one-shot pack") {
    val dir = graft.Scratch.fresh("seqpack-spec") + "/packed"
    SequencePack.writePacked(packable.filter(col("doc_id") < 150),
      "doc_id", "n_tokens", 9, dir, buckets = 3)
    SequencePack.appendPacked(
      packable.filter(col("doc_id") >= 150 && col("doc_id") < 320),
      "doc_id", "n_tokens", dir)
    SequencePack.appendPacked(packable.filter(col("doc_id") >= 320),
      "doc_id", "n_tokens", dir)
    val incremental = SequencePack.readPacked(spark, dir)
      .collect().map(_.toSeq).toSet
    val oneShot = SequencePack.pack(fixture, "doc_id", "n_tokens", 9, 5)
      .collect().map(_.toSeq).toSet
    assert(incremental === oneShot)
  }

  test("appendPacked treats an empty batch as a no-op (idle micro-batch)") {
    val dir = graft.Scratch.fresh("seqpack-spec-empty") + "/packed"
    SequencePack.writePacked(packable.filter(col("doc_id") < 150),
      "doc_id", "n_tokens", 9, dir, buckets = 3)
    val before = SequencePack.readPacked(spark, dir).count()
    SequencePack.appendPacked(packable.filter(col("doc_id") < 0),
      "doc_id", "n_tokens", dir)
    assert(SequencePack.readPacked(spark, dir).count() === before)
  }

  test("the persisted lifecycle rejects zero-token rows (frontier cannot " +
      "cover them)") {
    val dir = graft.Scratch.fresh("seqpack-spec-zero") + "/packed"
    val e = intercept[IllegalArgumentException] {
      SequencePack.writePacked(fixture.filter(col("doc_id") < 150),
        "doc_id", "n_tokens", 9, dir, buckets = 3)
    }
    assert(e.getMessage.contains("n_tokens > 0"))
    SequencePack.writePacked(packable.filter(col("doc_id") < 150),
      "doc_id", "n_tokens", 9, dir, buckets = 3)
    val e2 = intercept[IllegalArgumentException] {
      SequencePack.appendPacked(fixture.filter(col("doc_id") >= 150),
        "doc_id", "n_tokens", dir)
    }
    assert(e2.getMessage.contains("n_tokens > 0"))
  }

  test("appendPacked rejects keys at or below the stored frontier") {
    val dir = graft.Scratch.fresh("seqpack-spec-mono") + "/packed"
    SequencePack.writePacked(packable.filter(col("doc_id") < 150),
      "doc_id", "n_tokens", 9, dir, buckets = 3)
    val e = intercept[IllegalArgumentException] {
      SequencePack.appendPacked(packable.filter(col("doc_id") >= 100),
        "doc_id", "n_tokens", dir)
    }
    assert(e.getMessage.contains("frontier"))
  }

  test("a document longer than several sequences spans them all") {
    val docs = Seq((1L, 5L), (2L, 40L), (3L, 2L)).toDF("doc_id", "n_tokens")
    val packed = SequencePack.pack(docs, "doc_id", "n_tokens", 10, buckets = 2)
      .select(col("seq_id"), col("doc_id"), col("tok_len"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 2 occupies [5, 45): tail of seq 0, all of 1-3, head of 4
    assert(packed.filter(_._2 == 2L).map(r => r._1 -> r._3).toMap ===
      Map(0L -> 5L, 1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 5L))
    // doc 3 follows immediately at offset 45
    assert(packed.filter(_._2 == 3L).toSeq === Seq((4L, 3L, 2L)))
  }
}
