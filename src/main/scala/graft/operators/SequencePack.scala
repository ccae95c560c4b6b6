package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence PACKING — the training-data step after chunking/curation:
  * concatenate the (deduped, filtered, ordered) token stream and cut it
  * into fixed-length model sequences, letting documents CROSS sequence
  * boundaries. This is the standard "concat-and-chunk" LLM pretraining
  * layout (one sequence = `seqLen` tokens of back-to-back documents,
  * no padding except the final partial sequence) — distinct from q65's
  * per-document chunking, which never crosses documents and pads every
  * tail.
  *
  * Relation to q87/q90 (`TextQueries.sequencePack`/`sequenceSpans`):
  * those pack PER HASH SHARD — 8 independent token streams, each with
  * its own sequence numbering — because a shard-partitioned window was
  * the only scalable cumsum available. That changes the layout
  * semantics (sequence ids are (shard, seq) pairs; stream order is
  * shard-local). This operator keeps the SINGLE global stream a
  * trainer actually consumes — one totally-ordered sequence space —
  * and gets scalability from [[PrefixSum]] instead of from weakening
  * the contract.
  *
  * The whole operator is arithmetic on ONE number per document: its
  * exclusive/inclusive global token offset `[start_off, end_off)` in
  * the concatenated stream, which [[PrefixSum.running]] computes as a
  * distributed two-phase scan (no single-partition window). From the
  * offsets, the sequences a document overlaps are
  * `start_off div L .. (end_off - 1) div L` — a codegen
  * `explode(sequence(...))` fan-out of `1 + ceil(n/L)` rows max per
  * document, embarrassingly parallel, no further shuffle. Every token
  * is assigned to exactly one (sequence, position): Σ tok_len = Σ
  * n_tokens by construction, and per-sequence fills are exactly
  * `seqLen` except the last — the invariants the q194 manifest and
  * `SequencePackSpec` pin.
  *
  * At 100 TB: cost = one PrefixSum (one data-sized exchange) + a scan
  * stage; the fan-out adds ~n_tokens/L rows. Packing order is the
  * caller's key (here doc_id; an epoch shuffle feeds a shuffled unique
  * rank — the composition q113 establishes).
  */
object SequencePack {

  /** Per-(sequence, document) contribution rows for packing `docs` in
    * ascending `idCol` order into `seqLen`-token sequences.
    *
    * Output columns (beyond `idCol` and `nTokCol`):
    *  - `seq_id`     — 0-based sequence index
    *  - `start_off`/`end_off` — the document's global token span
    *  - `tok_start`  — the contribution's offset WITHIN the sequence
    *  - `tok_len`    — tokens this document contributes to this sequence
    *
    * Empty documents (`nTokCol` = 0) occupy no tokens and emit no rows.
    */
  def pack(docs: DataFrame, idCol: String, nTokCol: String, seqLen: Int,
      buckets: Int = 32): DataFrame = {
    require(seqLen >= 1, s"SequencePack.pack needs seqLen >= 1, got $seqLen")
    val withEnd = PrefixSum.running(
      docs.filter(col(nTokCol) > 0), idCol, nTokCol, "end_off", buckets)
    val spanned = withEnd
      .withColumn("start_off", col("end_off") - col(nTokCol).cast("long"))
      // integer floor-division on non-negative longs (matches SQL `//`)
      .withColumn("__first", expr(s"start_off DIV $seqLen"))
      .withColumn("__last", expr(s"(end_off - 1) DIV $seqLen"))
    val segStart = greatest(col("start_off"), col("seq_id") * seqLen)
    val segEnd = least(col("end_off"), (col("seq_id") + 1) * seqLen)
    spanned
      .select(col(idCol), col(nTokCol), col("start_off"), col("end_off"),
        explode(sequence(col("__first"), col("__last"))).as("seq_id"))
      .select(col("seq_id"), col(idCol), col(nTokCol),
        col("start_off"), col("end_off"),
        (segStart - col("seq_id") * seqLen).as("tok_start"),
        (segEnd - segStart).as("tok_len"))
  }
}
