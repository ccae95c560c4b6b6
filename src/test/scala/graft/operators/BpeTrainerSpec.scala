package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(word: String, cnt: Long, m: BpeTrainer.Merge): String =
    BpeTrainer.applyMerge(
        BpeTrainer.initSeqs(Seq((word, cnt)).toDF("word", "cnt")), m)
      .collect().head.getAs[String]("seq")

  test("applyMerge is greedy left-to-right non-overlapping") {
    assert(seg("aaaa", 1L, BpeTrainer.Merge("a", "a", 0L)) === "aa aa")
    assert(seg("aaa", 1L, BpeTrainer.Merge("a", "a", 0L)) === "aa a")
    assert(seg("abc", 1L, BpeTrainer.Merge("b", "c", 0L)) === "a bc")
    assert(seg("abc", 1L, BpeTrainer.Merge("a", "b", 0L)) === "ab c")
  }

  test("merge only fuses whole symbols, never suffixes") {
    // pair (b, c) must not fire on the 'ab' token's trailing 'b'
    val m = BpeTrainer.Merge("b", "c", 0L)
    val seqs = Seq(("x", 1L, "ab c")).toDF("word", "cnt", "seq")
    assert(BpeTrainer.applyMerge(seqs, m).collect().head
      .getAs[String]("seq") === "ab c")
  }

  test("trains the Sennrich walkthrough: most frequent pair first") {
    // 'es' occurs 9× (newest 6 + widest 3); nothing beats it
    val corpus = Seq(
      ("d1", ("low " * 5) + ("lower " * 2) + ("newest " * 6)),
      ("d2", "widest widest widest")
    ).toDF("doc_id", "text")
    val (merges, seqs) = BpeTrainer.train(corpus, "text", 2)
    assert(merges.head === BpeTrainer.Merge("e", "s", 9L))
    // round 2: 'es'+'t' now pairs 9× and wins
    assert(merges(1) === BpeTrainer.Merge("es", "t", 9L))
    val newest = seqs.filter(col("word") === "newest")
      .collect().head.getAs[String]("seq")
    assert(newest === "n e w est")
  }

  test("train stops gracefully when nothing is left to merge") {
    val corpus = Seq(("d1", "a b c")).toDF("doc_id", "text")
    val (merges, _) = BpeTrainer.train(corpus, "text", 5)
    assert(merges.isEmpty, "single-char words have no pairs to merge")
  }

  test("merged symbols chain across rounds (learned token grows)") {
    val corpus = Seq(("d1", ("spark " * 10) + "sp ar k")).toDF("doc_id", "text")
    val (merges, _) = BpeTrainer.train(corpus, "text", 3)
    // r1: (a,r)=11 beats (s,p)=11 lexicographically; r2: (s,p)=11 now
    // wins alone; r3: (ar,k)=10 beats (sp,ar)=10 lexicographically —
    // the learned 'ar' symbol chains into 'ark'
    assert(merges.map(m => m.x + m.y) === Seq("ar", "sp", "ark"))
  }
}
