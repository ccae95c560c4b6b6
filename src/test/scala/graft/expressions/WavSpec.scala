package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.multimodal.Multimodal

/** Pins the RIFF/WAVE PCM kernel: hand-built containers (chunk walk
  * over unknown chunks, pad-byte alignment, sign extension), rejection
  * of malformed/unsupported payloads as DATA, and equivalence of
  * [[WavDecode]]'s sample folds with a pure-`functions._` hex-string
  * reference over the real encoded fixture corpus.
  */
class WavSpec extends SparkTestBase {

  private def le2(v: Int): Seq[Int] = Seq(v & 0xFF, (v >> 8) & 0xFF)
  private def le4(v: Int): Seq[Int] =
    Seq(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF)
  private def ascii(s: String): Seq[Int] = s.map(_.toInt)

  private def wav(samples: Seq[Int], rate: Int = 8000,
      channels: Int = 1, bits: Int = 16, audioFormat: Int = 1,
      extraChunk: Option[(String, Seq[Int])] = None): Array[Byte] = {
    val data = samples.flatMap(s => le2(s & 0xFFFF))
    val extra = extraChunk.toSeq.flatMap { case (tag, body) =>
      ascii(tag) ++ le4(body.size) ++ body ++
        (if (body.size % 2 == 1) Seq(0) else Nil) // pad byte
    }
    val fmt = ascii("fmt ") ++ le4(16) ++ le2(audioFormat) ++
      le2(channels) ++ le4(rate) ++ le4(rate * 2) ++ le2(2) ++ le2(bits)
    val dataChunk = ascii("data") ++ le4(data.size) ++ data
    val body = ascii("WAVE") ++ fmt ++ extra ++ dataChunk
    (ascii("RIFF") ++ le4(body.size) ++ body).map(_.toByte).toArray
  }

  private def dec(b: Array[Byte]) = Wav.decode(b)

  test("canonical mono 16-bit PCM decodes: counts, duration, loudness, " +
      "zero crossings, sign extension") {
    // samples: +100, -200, +300, 0, -1 -> sum_abs 601, peak 300,
    // crossings at (+100,-200), (-200,+300); 0 breaks the sign chain
    // and (0,-1) is not a strict sign flip
    val r = dec(wav(Seq(100, -200, 300, 0, -1), rate = 8000))
    assert(r.getBoolean(0))
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) === (1, 8000, 16))
    assert(r.getLong(4) === 5L)
    assert(r.getLong(5) === 5L * 1000 / 8000)
    assert(r.getLong(6) === 601L)
    assert(r.getInt(7) === 300)
    assert(r.getLong(8) === 2L)
    // -32768 (0x8000) sign-extends to the most negative 16-bit value
    val ext = dec(wav(Seq(-32768, 32767)))
    assert(ext.getLong(6) === 32768L + 32767L)
    assert(ext.getInt(7) === 32768)
  }

  test("chunk walk skips unknown chunks (with odd-size pad byte) and " +
      "still finds data") {
    val r = dec(wav(Seq(5, -5), extraChunk = Some(("LIST", Seq(1, 2, 3)))))
    assert(r.getBoolean(0))
    assert(r.getLong(4) === 2L)
    assert(r.getLong(8) === 1L)
  }

  test("malformed/unsupported payloads are valid=false, never a throw") {
    assert(!dec("not audio at all, definitely not".getBytes).getBoolean(0))
    assert(!dec(null).getBoolean(0))
    assert(!dec(wav(Seq(1, 2), channels = 2)).getBoolean(0)) // stereo
    assert(!dec(wav(Seq(1, 2), bits = 8)).getBoolean(0)) // 8-bit
    assert(!dec(wav(Seq(1, 2), audioFormat = 3)).getBoolean(0)) // float
    // truncated data chunk: declared size runs past the payload
    val t = wav(Seq(1, 2, 3, 4))
    assert(!dec(t.dropRight(3)).getBoolean(0))
  }

  test("WavDecode folds == pure-functions._ hex reference over the " +
      "real encoded corpus (codegen path, whole fixture)") {
    val assets = Multimodal.wavAssets(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    // reference: 16-bit LE signed values from hex() + conv; the kernel
    // gets no offsets — it walks the chunks (header is the canonical
    // 44 bytes by the encoder's construction)
    val ref = assets
      .withColumn("hx", hex(col("payload")))
      .select(col("asset_id"), col("hx"),
        explode(sequence(lit(0L), col("n_samples") - 1)).as("i"))
      .withColumn("lo", conv(
        expr("substring(hx, cast((44 + i * 2) * 2 + 1 as int), 2)"), 16, 10)
        .cast("long"))
      .withColumn("hi", conv(
        expr("substring(hx, cast((44 + i * 2 + 1) * 2 + 1 as int), 2)"), 16, 10)
        .cast("long"))
      .withColumn("u", col("lo") + col("hi") * 256)
      .withColumn("s", when(col("u") >= 32768, col("u") - 65536)
        .otherwise(col("u")))
      .groupBy(col("asset_id"))
      .agg(sum(abs(col("s"))).as("sum_abs"),
        max(abs(col("s"))).cast("int").as("peak"),
        count(lit(1)).as("n"))
    val kernel = assets
      .withColumn("d", Multimodal.wavDecode(col("payload")))
      .select(col("asset_id"), col("d.valid").as("v"),
        col("d.sum_abs").as("ks"), col("d.peak").as("kp"),
        col("d.n_samples").as("kn"))
    val joined = ref.join(kernel, "asset_id")
      .filter(!col("v") || !(col("sum_abs") <=> col("ks")) ||
        !(col("peak") <=> col("kp")) || !(col("n") <=> col("kn")))
    assert(joined.count() === 0, joined.limit(3).collect().mkString("; "))
  }
}
