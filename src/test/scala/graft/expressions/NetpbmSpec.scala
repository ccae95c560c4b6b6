package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.multimodal.Multimodal

/** Pins the P6 byte-level kernels: the header grammar (magic, comments,
  * single separator byte), rejection of malformed payloads as DATA
  * (`valid=false` / empty grid, never an exception), hand-computed
  * channel sums and grid means, and equivalence of [[PpmDecode]]'s
  * sums with a pure-`functions._` hex-string reference over the real
  * encoded fixture corpus.
  */
class NetpbmSpec extends SparkTestBase {

  private def ppm(header: String, pixels: Array[Int]): Array[Byte] =
    header.getBytes("UTF-8") ++ pixels.map(_.toByte)

  // 2x1 image: pixels (10,20,30) and (40,50,60)
  private val tiny = ppm("P6\n2 1\n255\n", Array(10, 20, 30, 40, 50, 60))

  test("parseHeader: plain header, comment lines, CRLF whitespace") {
    assert(Netpbm.parseHeader(tiny).toSeq === Seq(2, 1, 255, 11))
    val commented = ppm("P6\n# made by graft\n2 1\n# dims done\n255\n",
      Array(1, 2, 3, 4, 5, 6))
    assert(Netpbm.parseHeader(commented).take(3).toSeq === Seq(2, 1, 255))
    val crlf = ppm("P6\r\n2\t1 255\n", Array(0, 0, 0, 0, 0, 0))
    assert(Netpbm.parseHeader(crlf).take(3).toSeq === Seq(2, 1, 255))
  }

  test("parseHeader rejects: bad magic, 2-byte samples, truncation, " +
      "missing separator, token glued to magic") {
    assert(Netpbm.parseHeader("P5\n2 1\n255\n??????".getBytes) == null)
    assert(Netpbm.parseHeader(ppm("P6\n2 1\n65535\n",
      Array.fill(12)(0))) == null) // maxval 65535 = 2-byte samples
    assert(Netpbm.parseHeader(ppm("P6\n2 1\n255\n",
      Array(1, 2, 3, 4, 5)) /* one byte short */) == null)
    assert(Netpbm.parseHeader("P6".getBytes) == null)
    assert(Netpbm.parseHeader("P62 1 255 ......".getBytes) == null)
    assert(Netpbm.parseHeader(Array[Byte]()) == null)
    assert(Netpbm.parseHeader(null) == null)
  }

  test("decode sums channels from raw bytes; malformed -> valid=false") {
    val r = Netpbm.decode(tiny)
    assert(r.getBoolean(0))
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) === (2, 1, 255))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ===
      (2L, 50L, 70L, 90L)) // n_px, 10+40, 20+50, 30+60
    val bad = Netpbm.decode("not an image".getBytes)
    assert(!bad.getBoolean(0) && bad.getLong(5) === 0L)
    // high bytes are unsigned: a 255 pixel sums as 255, not -1
    val high = Netpbm.decode(ppm("P6\n1 1\n255\n", Array(255, 254, 253)))
    assert((high.getLong(5), high.getLong(6), high.getLong(7)) ===
      (255L, 254L, 253L))
  }

  test("lumaGrid: hand-computed 2x2 grid over a 4x2 image; malformed " +
      "-> empty; undersized image fills empty cells with 0") {
    // 4x2 pixels, luminance (r+g+b)/3 per pixel laid out:
    //   3  6  9 12
    //  15 18 21 24   -> 2x2 cells avg: (3+6+15+18)/4 etc. per cell
    val px = (1 to 24).toArray // pixel p has bytes 3p-2..3p
    val img = ppm("P6\n4 2\n255\n", px)
    val g = Netpbm.lumaGrid(img, 2, 2).toDoubleArray()
    assert(g.length === 4)
    // cell (0,0): pixels 0,1 row0 + 0,1 row1? height 2, gh 2 -> each row
    // its own cell row. cell00 = pixels (0,0),(1,0): lumas 2,5 -> 3.5
    assert(g.toSeq === Seq((2.0 + 5.0) / 2, (8.0 + 11.0) / 2,
      (14.0 + 17.0) / 2, (20.0 + 23.0) / 2))
    assert(Netpbm.lumaGrid("junk".getBytes, 2, 2).numElements() === 0)
    // 1x1 image under a 2x2 grid: pixel lands in cell 0, rest are 0.0
    val one = Netpbm.lumaGrid(ppm("P6\n1 1\n255\n", Array(30, 60, 90)), 2, 2)
    assert(one.toDoubleArray().toSeq === Seq(60.0, 0.0, 0.0, 0.0))
  }

  test("streamDecode walks concatenated frames; rejects dimension " +
      "changes, trailing bytes, and empty payloads") {
    val f0 = ppm("P6\n2 1\n255\n", Array(10, 20, 30, 40, 50, 60)) // luma 210
    val f1 = ppm("P6\n2 1\n255\n", Array(1, 2, 3, 4, 5, 6)) // luma 21
    val f2 = ppm("P6\n2 1\n255\n", Array(0, 0, 0, 0, 0, 9)) // luma 9
    val r = Netpbm.streamDecode(f0 ++ f1 ++ f2)
    assert(r.getBoolean(0))
    assert((r.getLong(1), r.getInt(2), r.getInt(3)) === (3L, 2, 1))
    assert(r.getLong(4) === 6L) // 3 frames x 2 px
    assert((r.getLong(5), r.getLong(6)) === (210L, 9L))
    // single frame: first == last
    val one = Netpbm.streamDecode(f0)
    assert(one.getBoolean(0) && one.getLong(5) === one.getLong(6))
    // a frame with different dims mid-stream is a broken container
    val other = ppm("P6\n1 1\n255\n", Array(7, 8, 9))
    assert(!Netpbm.streamDecode(f0 ++ other).getBoolean(0))
    // trailing garbage after the last frame boundary
    assert(!Netpbm.streamDecode(f0 ++ "junk".getBytes).getBoolean(0))
    assert(!Netpbm.streamDecode(Array[Byte]()).getBoolean(0))
    assert(!Netpbm.streamDecode(null).getBoolean(0))
  }

  test("resize: nearest-neighbor floor mapping, output is itself a " +
      "decodable P6; malformed input -> empty bytes") {
    // 4x2 image (pixel p bytes = 3p+1..3p+3) resized to 2x1:
    // out(0,0) <- src(0,0)=pixel0 (1,2,3); out(1,0) <- src(2,0)=pixel2 (7,8,9)
    val img = ppm("P6\n4 2\n255\n", (1 to 24).toArray)
    val small = Netpbm.resize(img, 2, 1)
    assert(Netpbm.parseHeader(small).take(3).toSeq === Seq(2, 1, 255))
    val d = Netpbm.decode(small)
    assert(d.getBoolean(0))
    assert((d.getLong(5), d.getLong(6), d.getLong(7)) === (8L, 10L, 12L))
    // upscale also works (pixel replication)
    val big = Netpbm.decode(Netpbm.resize(img, 8, 4))
    assert(big.getBoolean(0) && big.getLong(4) === 32L)
    assert(Netpbm.resize("junk".getBytes, 2, 2).isEmpty)
  }

  test("sampleFrameLumas decodes only every stride-th frame, in order") {
    val f0 = ppm("P6\n2 1\n255\n", Array(10, 20, 30, 40, 50, 60)) // mean 35
    val f1 = ppm("P6\n2 1\n255\n", Array(1, 2, 3, 4, 5, 6)) // mean 3.5
    val f2 = ppm("P6\n2 1\n255\n", Array(0, 0, 0, 0, 0, 9)) // mean 1.5
    val s = f0 ++ f1 ++ f2
    assert(Netpbm.sampleFrameLumas(s, 2).toDoubleArray().toSeq ===
      Seq(35.0, 1.5))
    assert(Netpbm.sampleFrameLumas(s, 1).toDoubleArray().toSeq ===
      Seq(35.0, 3.5, 1.5))
    assert(Netpbm.sampleFrameLumas(s, 3).toDoubleArray().toSeq === Seq(35.0))
    assert(Netpbm.sampleFrameLumas("junk".getBytes, 2).numElements() === 0)
  }

  test("packBytes: low 8 bits, null elements -> 0, empty -> empty") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq(0, 1, 255, 256, 257, -1)))
      .toDF("xs")
      .select(Netpbm.packBytesColumn(col("xs")).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    assert(out.map(_ & 0xFF).toSeq === Seq(0, 1, 255, 0, 1, 255))
    val empty = Seq(Tuple1(Seq.empty[Int])).toDF("xs")
      .select(Netpbm.packBytesColumn(col("xs")).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    assert(empty.isEmpty)
  }

  test("PpmDecode sums == pure-functions._ hex-string reference over " +
      "the real encoded corpus (codegen path, whole fixture)") {
    val assets = Multimodal.ppmAssets(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    // reference: decode channel sums via hex() + substring + conv —
    // no custom kernel anywhere. Header length recovered from the
    // encoder's arithmetic (the kernel gets no such hint: it parses).
    val hdrLen = lit(3) + length(col("width").cast("string")) + lit(1) +
      length(col("height").cast("string")) + lit(5) +
      when(col("asset_id") % 5 === 0, 4).otherwise(0)
    val ref = assets
      .withColumn("hdr", hdrLen)
      .withColumn("hx", hex(col("payload")))
      .withColumn("npx", col("width").cast("long") * col("height"))
      .select(col("asset_id"), col("hdr"), col("hx"),
        explode(sequence(lit(0L), col("npx") * 3 - 1)).as("i"))
      .withColumn("byte", conv(
        expr("substring(hx, cast((hdr + i) * 2 + 1 as int), 2)"), 16, 10)
        .cast("long"))
      .groupBy(col("asset_id"))
      .agg(
        sum(when(col("i") % 3 === 0, col("byte"))).as("r"),
        sum(when(col("i") % 3 === 1, col("byte"))).as("g"),
        sum(when(col("i") % 3 === 2, col("byte"))).as("b"))
    val kernel = assets
      .withColumn("d", Multimodal.ppmDecode(col("payload")))
      .select(col("asset_id"), col("d.r_sum").as("kr"),
        col("d.g_sum").as("kg"), col("d.b_sum").as("kb"))
    val joined = ref.join(kernel, "asset_id")
      .filter(!(col("r") <=> col("kr")) || !(col("g") <=> col("kg")) ||
        !(col("b") <=> col("kb")))
    assert(joined.count() === 0, joined.limit(3).collect().mkString("; "))
  }
}
