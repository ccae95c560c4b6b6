package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("kmv is exact below k and estimates within ~3/sqrt(k) above it") {
    val small = (1 to 100).map(i => s"key_$i").toDF("k")
    val Seq((kUsed, _, est)) = kmvRun(small, 256)
    assert(kUsed == 100L && est == 100.0)

    val big = (1 to 20000).map(i => s"key_$i").toDF("k")
    val Seq((kUsed2, _, est2)) = kmvRun(big, 256)
    assert(kUsed2 == 256L)
    assert(math.abs(est2 - 20000) / 20000.0 < 3.0 / math.sqrt(256),
      s"estimate $est2 off by more than 3/sqrt(k)")
  }

  private def kmvRun(df: org.apache.spark.sql.DataFrame, k: Int) =
    Sketches.kmv(df, col("k"), k)
      .select(col("k_used"), col("kth_hash"),
        Sketches.kmvEstimate(col("k_used"), col("kth_hash"), k).as("e"))
      .as[(Long, Long, Double)].collect().toSeq

  test("kmv result is partition-count invariant (mergeable sketch)") {
    val data = (1 to 5000).map(i => s"u$i")
    val a = kmvRun(data.toDF("k").repartition(1), 128)
    val b = kmvRun(data.toDF("k").repartition(17), 128)
    assert(a == b)
  }

  test("bloom has no false negatives and a bounded false-positive rate") {
    val m = 1 << 14
    val nh = 4
    val members = (1 to 1000).map(i => s"in_$i").toDF("s")
      .select(graft.functions.Text.charHash(col("s")).as("h"))
    val filter = Sketches.bloomBuild(members, "h", m, nh)
    // every member must probe positive
    val memberHits = Sketches.bloomProbe(members, "h", filter, m, nh)
      .filter(!col("might_contain")).count()
    assert(memberHits == 0, "bloom false negative")
    // disjoint probes: FP rate should be near (1 - e^{-kn/m})^k ≈ 0.24%
    val outsiders = (1 to 5000).map(i => s"out_$i").toDF("s")
      .select(graft.functions.Text.charHash(col("s")).as("h"))
    val fp = Sketches.bloomProbe(outsiders, "h", filter, m, nh)
      .filter(col("might_contain")).count()
    assert(fp < 5000 * 0.02, s"false-positive count $fp exceeds 2%")
  }

  test("bloomBits sizing: word-aligned, floored, capped, linear in n") {
    assert(Sketches.bloomBits(0, 32) === 64)   // empty build side
    assert(Sketches.bloomBits(1, 32) === 64)   // floor
    assert(Sketches.bloomBits(1000, 32) === 32000)
    assert(Sketches.bloomBits(1000, 10) === 10016) // rounded up to words
    assert(Sketches.bloomBits(1000, 10) % 32 === 0)
    // cap = 2^28 bits = 32 MB in the collectFilter 64-bit packing
    assert(Sketches.bloomBits(Long.MaxValue / 64, 32) === (1 << 28))
  }

  test("derived sizing keeps the FP rate at its m/n-determined bound " +
      "as the build side grows") {
    // the failure mode that motivated derived sizing: a filter sized for
    // n keys saturates at 100n. With bloomBits the load factor — and so
    // the FP bound (1 - e^{-kn/m})^k — is the same at both scales.
    val nh = 4
    def fpRate(n: Int): Double = {
      val members = (1 to n).map(i => s"in_$i").toDF("s")
        .select(Sketches.uniformHash(col("s")).as("h"))
      val m = Sketches.bloomBits(n, 32)
      val filter = Sketches.bloomBuild(members, "h", m, nh)
      assert(Sketches.bloomProbe(members, "h", filter, m, nh)
        .filter(!col("might_contain")).count() === 0, "false negative")
      val outsiders = (1 to 5000).map(i => s"out_$i").toDF("s")
        .select(Sketches.uniformHash(col("s")).as("h"))
      Sketches.bloomProbe(outsiders, "h", filter, m, nh)
        .filter(col("might_contain")).count().toDouble / 5000
    }
    // k=4, m/n=32 -> theoretical FP (1 - e^{-1/8})^4 ~= 1.9e-4; allow
    // generous sampling slack but stay an order below the saturated 100%
    assert(fpRate(500) <= 0.005, s"fp at n=500: ${fpRate(500)}")
    assert(fpRate(20000) <= 0.005, s"fp at n=20000: ${fpRate(20000)}")
  }

  test("count-min never underestimates and is exact for isolated cells") {
    val w = 512
    // skewed stream: key_1 appears 1000x, key_2..key_50 10x, rest once
    val data = Seq.fill(1000)("key_1") ++
      (2 to 50).flatMap(i => Seq.fill(10)(s"key_$i")) ++
      (51 to 500).map(i => s"key_$i")
    val hashes = data.toDF("k")
      .select(col("k"), Sketches.uniformHash(col("k")).as("h"))
    val counters = Sketches.cmsBuild(hashes, "h", w)
    val exact = hashes.groupBy("k", "h").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(exact, "h", counters, w)
      .select(col("k"), col("exact"), col("cms_est"))
      .as[(String, Long, Long)].collect()
    assert(est.forall { case (_, ex, e) => e >= ex },
      "CMS underestimated a count")
    // the heavy hitter dominates its cells: estimate must be exact
    assert(est.find(_._1 == "key_1").exists { case (_, ex, e) => e == ex })
  }

  test("count-min estimate: one row per distinct probe, partition-invariant") {
    val w = 256
    val stream = (1 to 500).map(i => s"k${i % 11}").toDF("k")
      .select(col("k"), Sketches.uniformHash(col("k")).as("h"))
    val counters = Sketches.cmsBuild(stream, "h", w)
    // the contract: output carries one row per DISTINCT probe row with
    // all carried columns intact — duplicate probes collapse losslessly
    // (the estimate is a pure function of the hash) — and with no
    // synthetic row ids involved, the output is identical however the
    // probe frame is partitioned (the stage-retry-safety the old
    // monotonically_increasing_id formulation could not promise)
    val probes = Seq("k1", "k2", "k3").toDF("k")
      .select(col("k"), Sketches.uniformHash(col("k")).as("h"))
    def run(parts: Int) =
      Sketches.cmsEstimate(probes.repartition(parts), "h", counters, w)
        .orderBy(col("k")).select(col("k"), col("cms_est"))
        .as[(String, Long)].collect().toSeq
    assert(run(1).size === 3)
    assert(run(1) == run(7))
    // duplicate probe rows collapse to one identical row, never to a
    // wrong estimate
    val dup = probes.unionByName(probes)
    val collapsed = Sketches.cmsEstimate(dup, "h", counters, w)
      .orderBy(col("k")).select(col("k"), col("cms_est"))
      .as[(String, Long)].collect().toSeq
    assert(collapsed === run(1))
  }

  test("count-min counters are partition-invariant (mergeable sums)") {
    val hashes = (1 to 3000).map(i => s"t${i % 97}").toDF("k")
      .select(Sketches.uniformHash(col("k")).as("h"))
    def run(parts: Int) =
      Sketches.cmsBuild(hashes.repartition(parts), "h", 256)
        .orderBy(col("j"), col("c")).as[(Int, Int, Long)].collect().toSeq
    assert(run(1) == run(13))
  }

  test("histogram quantile estimate stays within one grid width of exact") {
    val w = 256
    // deterministic skewed values (quadratic spread, no rand())
    val df = (1 to 20000).map(i => (i.toLong * i) / 1000.0).toDF("v")
    val qs = Seq(0.5, 0.9, 0.99)
    val est = Sketches.histQuantiles(Sketches.histBuild(df, "v", w), w, qs)
      .select(col("q"), col("est")).as[(Double, Double)].collect().toMap
    val gridWidth = (20000.0 * 20000 / 1000.0 - 1.0 / 1000.0) / w
    val exact = df.agg(expr(s"percentile(v, array(${qs.mkString(",")}))"))
      .as[Seq[Double]].head()
    qs.zip(exact).foreach { case (q, ex) =>
      val e = est(q)
      assert(e >= ex - gridWidth && e <= ex + gridWidth,
        s"q=$q est=$e exact=$ex width=$gridWidth")
    }
  }

  test("sketch-guided exact quantiles equal the percentile aggregate bit-for-bit") {
    val w = 64
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 1.0)
    // ties, skew, nulls, and a size that puts q·(n−1) on integer AND
    // fractional positions
    val base = (1 to 4001).map(i => (i % 37).toDouble * ((i % 5) + 1))
    val df = (base.map(Some(_)) ++ Seq.fill(50)(Option.empty[Double]))
      .toDF("v").repartition(9)
    val hist = Sketches.histBuild(df, "v", w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val got = Sketches.histExactQuantiles(df, "v", hist, w, qs)
      .select(col("q"), col("exact")).as[(Double, Double)].collect().toMap
    val want = df.agg(expr(s"percentile(v, array(${qs.mkString(",")}))"))
      .as[Seq[Double]].head()
    qs.zip(want).foreach { case (q, ex) =>
      assert(got(q) === ex, s"q=$q got=${got(q)} want=$ex")
    }
    spark.catalog.clearCache()
  }

  test("grouped histogram quantiles stay within each group's grid width of exact") {
    val w = 128
    val qs = Seq(0.5, 0.9)
    // three groups with very different spans — a shared grid would blur
    // the narrow ones; plus a single-valued group (vmax = vmin edge)
    // and a NULL-key group (must survive the stats join, not vanish)
    val df = ((1 to 4000).map(i => ("wide", i.toDouble * 50)) ++
      (1 to 4000).map(i => ("narrow", 100.0 + (i % 97) * 0.01)) ++
      (1 to 50).map(_ => ("flat", 42.0)) ++
      (1 to 300).map(i => (null.asInstanceOf[String], i.toDouble)))
      .toDF("g", "v")
      .repartition(7)
    val est = Sketches.histQuantilesGrouped(
        Sketches.histBuildGrouped(df, Seq("g"), "v", w), Seq("g"), w, qs)
      .select(col("g"), col("q"), col("est"))
      .as[(String, Double, Double)].collect()
      .map { case (g, q, e) => (g, q) -> e }.toMap
    val exact = df.groupBy(col("g"))
      .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("ex"),
        ((max(col("v")) - min(col("v"))) / w).as("width"))
      .select(col("g"), col("ex"), col("width"))
      .as[(String, Seq[Double], Double)].collect()
    exact.foreach { case (g, exs, width) =>
      qs.zip(exs).foreach { case (q, ex) =>
        val e = est((g, q))
        assert(e >= ex - width && e <= ex + width,
          s"g=$g q=$q est=$e exact=$ex width=$width")
      }
    }
  }

  test("histogram sketch ignores NULL values (counters sum to n)") {
    val df = ((1 to 100).map(i => Some(i.toDouble)) ++
      Seq.fill(40)(Option.empty[Double])).toDF("v")
    val hist = Sketches.histBuild(df, "v", 16)
    val Seq((total, n)) = hist
      .agg(sum(col("cnt")).as("t"), first(col("n")).as("n"))
      .as[(Long, Long)].collect().toSeq
    assert(n === 100L)
    assert(total === n, s"bucket counts $total != non-null count $n")
  }

  test("histogram sketch is partition-invariant (mergeable bucket sums)") {
    val data = (1 to 5000).map(i => math.sqrt(i.toDouble) * 3.7)
    def run(parts: Int) =
      Sketches.histBuild(data.toDF("v").repartition(parts), "v", 128)
        .select(col("bucket"), col("cnt"))
        .orderBy(col("bucket")).as[(Int, Long)].collect().toSeq
    assert(run(1) == run(17))
  }

  test("KMV shard sketches merge to exactly the whole-data sketch") {
    val df = (1 to 8000).map(i => s"u${i % 1700}").toDF("k")
    val k = 128
    val whole = Sketches.kmvSet(df, col("k"), k)
      .orderBy(col("h")).as[Long].collect().toSeq
    val shards = (0 until 3).map(s =>
      Sketches.kmvSet(df.filter(pmod(Sketches.uniformHash(col("k")),
        lit(3L)) === s), col("k"), k))
    val merged = Sketches.kmvMerge(shards, k)
      .orderBy(col("h")).as[Long].collect().toSeq
    assert(merged === whole)
  }

  test("Bloom filters merged by word-OR equal the union-built filter") {
    val a = (1 to 1500).map(i => s"a$i").toDF("s")
      .select(graft.functions.Text.charHash(col("s")).as("h"))
    val b = (1 to 1500).map(i => s"b$i").toDF("s")
      .select(graft.functions.Text.charHash(col("s")).as("h"))
    val m = 8192
    def words(df: org.apache.spark.sql.DataFrame) =
      Sketches.bloomBuild(df, "h", m, 3)
    val union = words(a.unionByName(b)).orderBy(col("w"))
      .as[(Int, Long)].collect().toSeq
    val merged = Sketches.bloomMerge(Seq(words(a), words(b)))
      .orderBy(col("w")).as[(Int, Long)].collect().toSeq
    assert(merged === union)
  }

  test("per-micro-batch histogram cells merge to the batch-built sketch (streaming rollup)") {
   withTempDir("graft_hist_stream") { root =>
    // the merge property's real use case: an incremental stream builds
    // cells per micro-batch; their sum must equal the one-shot sketch
    val w = 64
    val dir = root + "/data"
    val data = (1 to 9000).map(i => math.sqrt(i.toDouble) * 13.7).toDF("v")
    data.repartition(4).write.parquet(dir) // 4 files → 4 micro-batches
    val g = data.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .head()
    val grid = spark.createDataFrame(
      Seq((g.getDouble(0), g.getDouble(1)))).toDF("vmin", "vmax")
    val acc = scala.collection.mutable.ArrayBuffer[(Int, Double, Double, Long)]()
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized {
          acc ++= Sketches.histBucketize(batch, "v", w, grid)
            .as[(Int, Double, Double, Long)].collect()
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(acc.nonEmpty)
    val merged = Sketches.histMerge(Seq(
        spark.createDataFrame(acc.toSeq).toDF("bucket", "vmin", "vmax", "cnt")))
      .orderBy(col("bucket")).as[(Int, Double, Double, Long, Long)]
      .collect().toSeq
    val whole = Sketches.histBuild(data, "v", w)
      .orderBy(col("bucket")).as[(Int, Double, Double, Long, Long)]
      .collect().toSeq
    assert(merged === whole)
   }
  }

  test("grouped exact quantiles equal percentile() per group on the fixture") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val w = 64
    val qs = Seq(0.25, 0.5, 0.9)
    val hist = Sketches.histBuildGrouped(li, Seq("l_returnflag"),
      "l_extendedprice", w)
    val got = Sketches.histExactQuantilesGrouped(li, Seq("l_returnflag"),
        "l_extendedprice", hist, w, qs)
      .orderBy(col("l_returnflag"), col("q"))
      .as[(String, Double, Double)].collect().toSeq
    // foil: the built-in percentile aggregate (single-reducer per group)
    val want = li.groupBy(col("l_returnflag"))
      .agg(expr(s"percentile(l_extendedprice, array(${qs.mkString(",")}))")
        .as("ps"))
      .select(col("l_returnflag"), posexplode(col("ps")).as(Seq("i", "v")))
      .select(col("l_returnflag"), col("i"), col("v"))
      .collect()
      .map(r => (r.getString(0), qs(r.getInt(1)), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.size === want.size)
    got.zip(want).foreach { case ((gk, gq, gv), (wk, wq, wv)) =>
      assert(gk === wk && gq === wq)
      assert(gv === wv, s"group $gk q=$gq: got $gv want $wv")
    }
  }

  test("grouped exact quantiles handle a single-valued group and a null-key group") {
    val df = Seq(
      ("a", 5.0), ("a", 5.0), ("a", 5.0),          // vmax = vmin group
      ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)
    ).toDF("k", "v")
      .unionByName(Seq((Option.empty[String], 10.0),
        (Option.empty[String], 20.0)).toDF("k", "v"))
    val w = 8
    val qs = Seq(0.5)
    val hist = Sketches.histBuildGrouped(df, Seq("k"), "v", w)
    val got = Sketches.histExactQuantilesGrouped(df, Seq("k"), "v",
        hist, w, qs)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(2))).toMap
    assert(got(Some("a")) === 5.0)
    assert(got(Some("b")) === 2.5)
    assert(got(None) === 15.0)
  }

  test("merge helpers reject empty input and histMerge fails fast on mixed grids") {
    // an empty Seq is a caller bug: every merge helper says so instead
    // of throwing reduce's opaque UnsupportedOperationException
    assertThrows[IllegalArgumentException] { Sketches.histMerge(Seq.empty) }
    assertThrows[IllegalArgumentException] { Sketches.cmsMerge(Seq.empty) }
    assertThrows[IllegalArgumentException] { Sketches.bloomMerge(Seq.empty) }
    assertThrows[IllegalArgumentException] {
      Sketches.kmvMerge(Seq.empty, 16)
    }
    // cells built on DIFFERENT grids must not silently co-mingle: the
    // grouped union would keep both grids' rows while `n` became their
    // combined total — corrupted quantiles. histMerge raises instead.
    val w = 32
    val a = (1 to 500).map(_.toDouble).toDF("v")
    val gridA = spark.createDataFrame(Seq((1.0, 500.0))).toDF("vmin", "vmax")
    val gridB = spark.createDataFrame(Seq((0.0, 999.0))).toDF("vmin", "vmax")
    val cellsA = Sketches.histBucketize(a, "v", w, gridA)
    val cellsB = Sketches.histBucketize(a, "v", w, gridB)
    val e = intercept[Exception] {
      Sketches.histMerge(Seq(cellsA, cellsB)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("grids"),
      s"unexpected error: ${e.getMessage}")
    // same grid still merges cleanly (the guard is free on the good path)
    val ok = Sketches.histMerge(Seq(cellsA, cellsA))
    assert(ok.agg(max(col("n"))).head().getLong(0) === 1000L)
  }

  test("bloom bit words are identical regardless of input partitioning") {
    val hs = (1 to 2000).map(i => s"x$i").toDF("s")
      .select(graft.functions.Text.charHash(col("s")).as("h"))
    val w1 = Sketches.bloomBuild(hs.repartition(1), "h", 4096, 3)
      .orderBy(col("w")).as[(Int, Long)].collect().toSeq
    val w2 = Sketches.bloomBuild(hs.repartition(13), "h", 4096, 3)
      .orderBy(col("w")).as[(Int, Long)].collect().toSeq
    assert(w1 == w2)
  }
}
