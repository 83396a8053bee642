package graft

import graft.functions.{Fnv64, TextHashes}
import graft.llm.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("fnv64 is stable (golden)") {
    assert(Fnv64.hashString("spark") == Fnv64.hashString("spark"))
    assert(Fnv64.hashString("spark") != Fnv64.hashString("sparl"))
  }

  test("simhash: near-identical token lists differ in few bits") {
    import spark.implicits._
    val a = (1 to 100).map(i => s"tok$i").mkString(" ")
    val b = ((1 to 98).map(i => s"tok$i") ++ Seq("x", "y")).mkString(" ")
    val c = (200 to 300).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
      .select(col("id"), TextHashes.sim_hash64(split(col("t"), " ")).as("h"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m(1L), m(2L)) < 12, s"near-dup hamming ${ham(m(1L), m(2L))}")
    assert(ham(m(1L), m(3L)) > 16, s"distinct hamming ${ham(m(1L), m(3L))}")
  }

  test("simhashPairs finds planted near-dups at sf0.001") {
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
    // the fixtures plant ~5% near-dup docs; simhash should find some and
    // every reported pair must satisfy the hamming bound
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("hamming") <= 10))
  }

  test("minhash LSH pairs == exact jaccard pairs at sf0.001") {
    val docs = graft.core.Tables.t(spark, sf, "documents")
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.exactJaccardPairs(docs, "doc_id", "text",
        Dedup.wordShingles(_, 3), 0.7)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("ivf ann: exhaustive probe == brute force; pruned probe keeps recall") {
    val emb = graft.core.Tables.t(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(_.getLong(0)).toSeq
    val full = Similarity.annTopKIvf(emb, "vec_id", "embedding", 1L, 10,
        nlist = 16, nprobe = 16)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact, "nprobe = nlist must degenerate to exact brute force")
    val pruned = Similarity.annTopKIvf(emb, "vec_id", "embedding", 1L, 10,
        nlist = 16, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.count(pruned) / 10.0
    assert(recall >= 0.3, s"ivf recall too low: $recall")
    // every pruned result must also rank by true cosine: it's a subset
    // scanned with the exact kernel
    assert(pruned.subsetOf(emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet))
  }

  test("partitioned NSW ann: deterministic, high recall vs brute force") {
    val emb = graft.core.Tables.t(spark, sf, "embeddings")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(_.getLong(0)).toSeq
    def run() = Similarity.annTopKNsw(emb, "vec_id", "embedding", 1L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val a = run(); val b = run()
    assert(a.sameElements(b), "NSW graph build/search must be deterministic")
    val recall = exact.count(a.map(_._1).toSet) / 10.0
    assert(recall >= 0.8, s"nsw recall too low: $recall (got ${a.map(_._1).toSeq})")
    // returned cosines are EXACT (graph prunes candidates, never distances):
    // each returned cosine must match the brute-force kernel's value
    val returned = a.map(_._1).toSet
    val check = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 1L, 2000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.foreach { case (id, c) => assert(math.abs(check(id) - c) < 1e-12, s"cos drift for $id") }
  }

  test("ann lsh returns valid bucket-local neighbours, bounded by exact top-1") {
    val emb = graft.core.Tables.t(spark, sf, "embeddings")
    val bfTop = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 1)
      .collect()(0).getAs[Double]("cos")
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 10, nPlanes = 4).collect()
    assert(ann.nonEmpty && ann.length <= 10)
    val cosVals = ann.map(_.getAs[Double]("cos"))
    // sorted descending, and no ANN hit can beat the exact best
    assert(cosVals.sameElements(cosVals.sorted.reverse))
    assert(cosVals.forall(_ <= bfTop + 1e-12))
  }

  test("rolling hash: equal input equal hash, prefix change changes hash") {
    import spark.implicits._
    val df = Seq("hello world", "hello world", "jello world").toDF("t")
      .select(TextHashes.rolling_hash64(col("t")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }

  test("multimodal features preserve partitioning and row count") {
    val docs = graft.core.Tables.t(spark, sf, "documents").repartition(5)
    val assets = graft.llm.Multimodal.assetsFromText(docs, "doc_id", "text")
    val feats = graft.llm.Multimodal.extractFeatures(spark, assets)
    assert(feats.rdd.getNumPartitions == 5)
    assert(feats.count() == docs.count())
  }

  test("REAL image decode: PNG/JPEG/BMP via ImageIO, exact dims, PNG-exact luma") {
    import graft.llm.Multimodal
    // PNG is lossless: solid (40, 80, 120) -> mean gray == 80 exactly
    val png = Multimodal.encodeSolidPng(23, 11, 40, 80, 120)
    val Some((w, h, c, luma)) = Multimodal.decodeImageBytes(png)
    assert(w == 23 && h == 11 && c == 3 && math.abs(luma - 80.0) < 1e-9)
    // JPEG round-trip through the JDK encoder: dims exact, luma close
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0x646464)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val Some((jw, jh, _, jl)) = Multimodal.decodeImageBytes(jb.toByteArray)
    assert(jw == 16 && jh == 8 && math.abs(jl - 100.0) < 3.0)
    val bb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bb)
    val Some((bw, bh, _, bl)) = Multimodal.decodeImageBytes(bb.toByteArray)
    assert(bw == 16 && bh == 8 && math.abs(bl - 100.0) < 1e-9)
    // garbage bytes decode to None, not an exception
    assert(Multimodal.decodeImageBytes(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("REAL image resize: bilinear scale preserves solid color, dims change") {
    import graft.llm.Multimodal
    val png = Multimodal.encodeSolidPng(20, 20, 10, 200, 30)
    val Some(small) = Multimodal.resizeImage(png, 7, 5)
    val Some((w, h, _, luma)) = Multimodal.decodeImageBytes(small)
    assert(w == 7 && h == 5 && math.abs(luma - 80.0) < 1e-9)
  }

  test("REAL WAV decode: RIFF/PCM-16 header walk, exact rate/channels/amplitude") {
    import graft.llm.Multimodal
    val samples = Array.fill[Short](4000)(1234)
    val wav = Multimodal.encodeWavPcm16(samples, 16000, 2)
    val Some((rate, ch, frames, meanAbs)) = Multimodal.decodeWav(wav)
    assert(rate == 16000 && ch == 2 && frames == 2000 && math.abs(meanAbs - 1234.0) < 1e-9)
    assert(Multimodal.decodeWav("nope".getBytes).isEmpty)
  }

  test("imageNearDupPairs: dHash + banded hamming finds noised copies only") {
    import spark.implicits._
    import graft.llm.Multimodal
    // walk image for a 64-bit pattern; +-3 jitter never flips an 8-step
    def walk(kk: Long, jitter: Int => Int): Array[Byte] = {
      val pix = Array.ofDim[Int](8, 9)
      for (y <- 0 until 8) {
        var p = 128
        pix(y)(0) = p + jitter(y)
        for (x <- 0 until 8) {
          p += (if (((kk >> (y * 8 + x)) & 1L) == 1L) 8 else -8)
          pix(y)(x + 1) = p + jitter(y + x)
        }
      }
      Multimodal.encodeGrayPng(pix)
    }
    val k1 = 0x0F0F33CC55AA7718L
    val assets = Seq(
      (1L, walk(k1, _ => 0)),
      (2L, walk(k1, i => i % 7 - 3)),        // noised copy of 1
      (3L, walk(~k1, _ => 0)),               // complement: hamming 64 from 1
      (4L, Array[Byte](0, 1, 2))             // undecodable, dropped
    ).toDF("asset_id", "bytes")
    val pairs = Multimodal.imageNearDupPairs(spark, assets, maxHamming = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // the fingerprints themselves: noised == clean, complement differs
    val hs = Multimodal.imageDHashes(spark, assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs.size == 3 && hs(1L) == hs(2L) && hs(1L) != hs(3L))
    assert(hs(1L) == k1)
  }

  test("FFT + audioSpectralHash64: bin peaks, gain invariance, frequency sensitivity") {
    import graft.llm.Multimodal
    // FFT sanity: a pure sinusoid at exact bin 5 peaks at bin 5
    val re = Array.tabulate(256)(i => math.sin(2.0 * math.Pi * 5 * i / 256.0))
    val im = new Array[Double](256)
    Multimodal.fft(re, im)
    val mags = (0 until 128).map(m => re(m) * re(m) + im(m) * im(m))
    assert(mags.indexOf(mags.max) == 5)
    // fingerprint over a spectrally-rich signal (every compared bin has
    // real energy, the fingerprint's intended regime — comparisons over
    // empty bins would measure quantization noise): gain scaling leaves
    // it untouched, a different spectral profile moves it
    def wavOf(seed: Int, gain: Double): Array[Byte] = {
      val amp = (m: Int) => 120.0 + 17.0 * ((m * seed) % 13)
      val pcm = Array.tabulate[Short](1024) { i =>
        var sm = 0.0
        var m = 1
        while (m <= 66) {
          sm += amp(m) * gain * math.sin(2.0 * math.Pi * m * i / 1024.0); m += 1
        }
        math.round(sm).toShort
      }
      Multimodal.encodeWavPcm16(pcm, 8000, 1)
    }
    val a = Multimodal.audioSpectralHash64(wavOf(5, 1.0)).get
    val a2 = Multimodal.audioSpectralHash64(wavOf(5, 0.25)).get
    val b = Multimodal.audioSpectralHash64(wavOf(8, 1.0)).get
    assert(a == a2 && a != b)
    assert(Multimodal.audioSpectralHash64("junk".getBytes).isEmpty)
  }

  test("MJPEG/AVI mux-demux round trip and real frame sampling") {
    import spark.implicits._
    import graft.llm.Multimodal
    val frames = (0 until 7).map(i => Multimodal.encodeSolidJpeg(12, 10, 60 + i * 20))
    val avi = Multimodal.encodeMjpegAvi(frames, 12, 10)
    val Some(out) = Multimodal.demuxAviFrames(avi)
    assert(out.length == 7)
    // every demuxed frame is a decodable JPEG with the muxed dims and
    // approximately the muxed gray level (JPEG is lossy in values only)
    out.zipWithIndex.foreach { case (f, i) =>
      val Some((w, h, _, luma)) = Multimodal.decodeImageBytes(f)
      assert(w == 12 && h == 10 && math.abs(luma - (60 + i * 20)) < 4.0)
    }
    assert(Multimodal.demuxAviFrames("RIFFxxxxWAVE".getBytes).isEmpty)
    // distributed sampling: every 3rd frame, asset-local, junk dropped
    val assets = Seq((1L, avi), (2L, Array[Byte](1, 2, 3))).toDF("asset_id", "bytes")
    val sampled = Multimodal.sampleVideoFrames(spark, assets, everyN = 3).collect()
    assert(sampled.map(_.asset_id).toSet == Set(1L))
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(0, 3, 6))
  }

  test("extractMediaFeatures dispatches per kind in executors, no shuffle") {
    import spark.implicits._
    import graft.llm.Multimodal
    val rows = (0L until 60L).map { i =>
      if (i % 3 == 0)
        (i, Multimodal.encodeSolidPng(8 + (i % 5).toInt, 6, 90, 90, 90), "image/png")
      else if (i % 3 == 1)
        (i, Multimodal.encodeWavPcm16(Array.fill[Short](100)(7), 8000, 1), "audio/wav")
      else (i, Array[Byte](9, 9, 9), "application/unknown")
    }
    val assets = rows.toDF("asset_id", "bytes", "kind")
      .withColumn("n_bytes", length(col("bytes")).cast("long")).repartition(4)
    val feats = Multimodal.extractMediaFeatures(spark, assets).collect()
    assert(feats.length == 60)
    val imgs = feats.filter(_.kind == "image/png")
    assert(imgs.forall(f => f.ok && f.height == 6 && math.abs(f.mean_luma - 90.0) < 1e-9))
    val wavs = feats.filter(_.kind == "audio/wav")
    assert(wavs.forall(f => f.ok && f.sample_rate == 8000 && f.n_frames == 100L &&
      math.abs(f.mean_luma - 7.0) < 1e-9))
    assert(feats.filter(_.kind == "application/unknown").forall(!_.ok))
  }

  test("bucketed ANN corpus prunes to one partition and matches in-memory ANN") {
    val emb = graft.core.Tables.t(spark, sf, "embeddings")
    val path = "/tmp/graft_ann/bucketed_corpus"
    Similarity.writeBucketedCorpus(emb, "vec_id", "embedding", path, nPlanes = 6)
    // query = vector 0's embedding
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .collect()(0).getSeq[Float](0).map(_.toDouble)
    val indexed = Similarity.annTopKIndexed(spark, path, "vec_id", "embedding",
      qv, k = 11, nPlanes = 6)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket not pruned at partition level:\n${plan.take(2000)}")
    // same candidates as the in-memory ANN path (minus the self-match id 0)
    val mem = Similarity.annTopK(emb, "vec_id", "embedding", queryId = 0L,
      k = 10, nPlanes = 6).collect().map(_.getLong(0)).toSet
    val idx = indexed.collect().map(_.getLong(0)).filter(_ != 0L).take(10).toSet
    assert(idx == mem, s"indexed $idx vs in-memory $mem")

    // multi-probe (radius 1): the probe set ships as a LITERAL IN-list,
    // so PartitionFilters prunes to exactly 1 + nPlanes = 7 directories
    // (a bit_count(XOR) predicate would scan all 2^6)
    val probed = Similarity.annTopKIndexed(spark, path, "vec_id", "embedding",
      qv, k = 11, nPlanes = 6, probeRadius = 1)
    val pplan = probed.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(pplan).map(_.group(1)).getOrElse("")
    assert(pf.contains("bucket"), s"no bucket PartitionFilter:\n${pplan.take(2000)}")
    val nProbeVals = "-?\\d+".r.findAllIn(
      pf.substring(pf.indexOf("IN").max(0))).length
    assert(nProbeVals == 7, s"expected 7 probe buckets in $pf")
    // the radius-1 candidate POOL is a strict superset of radius-0's
    // (top-k order may differ — compare the full pools, not the top-k)
    val pool0 = Similarity.annTopKIndexed(spark, path, "vec_id", "embedding",
      qv, k = 1000000, nPlanes = 6).collect().map(_.getLong(0)).toSet
    val pool1 = Similarity.annTopKIndexed(spark, path, "vec_id", "embedding",
      qv, k = 1000000, nPlanes = 6, probeRadius = 1)
      .collect().map(_.getLong(0)).toSet
    assert(pool0.subsetOf(pool1), "radius-1 pool lost radius-0 candidates")
  }

  test("Corpus: rebalance caps groups, packing bins respect the budget") {
    val d = graft.core.Tables.t(spark, sf, "documents")
    val kept = graft.llm.Corpus.rebalance(d, col("lang"), col("doc_id"), 10)
    val over = kept.groupBy(col("lang")).count().filter(col("count") > 10).count()
    assert(over == 0)
    // deterministic: same subsample on a second run
    val kept2 = graft.llm.Corpus.rebalance(d, col("lang"), col("doc_id"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == kept2)

    val toks = d.select(col("doc_id"), size(split(col("text"), " ")).as("tok"))
    val packed = graft.llm.Corpus.packSequences(toks, col("doc_id"), col("tok"), 1000L)
    // each bin's exclusive-prefix span stays under budget + one max doc
    val maxTok = toks.agg(max(col("tok"))).collect()(0).getInt(0)
    val spans = packed.groupBy(col("bin")).agg(sum(col("tok")).as("s")).collect()
    assert(spans.forall(_.getLong(1) <= 1000L + maxTok))
    // bins are contiguous from 0
    val bins = spans.map(_.getLong(0)).sorted
    assert(bins.head == 0L && bins.zipWithIndex.forall { case (b, i) => b == i })
  }

  test("duplicateSpans finds shared token 8-grams and only those") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy"
    val docs = Seq(
      (1L, s"alpha $shared beta gamma delta epsilon zeta"),
      (2L, s"one two $shared three four five six seven"),
      (3L, "completely different words with no overlap at all here now")
    ).toDF("doc_id", "text")
    val spans = graft.llm.Dedup.duplicateSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(spans.contains(shared), s"shared span missing: ${spans.keys}")
    assert(spans(shared) == 2L)
    assert(spans.keys.forall(_.split(" ").length == 8))
    // doc 3 contributes nothing
    assert(!spans.keys.exists(_.contains("different")))
  }

  test("sampleFrames: stride windows, short assets yield zero frames") {
    import spark.implicits._
    val assets = Seq(
      (1L, "0123456789abcdef0123456789abcdefXXXXXXXXXXXXXXXX"), // 48 bytes -> 2 frames
      (2L, "short") // < frameSize -> none
    ).toDF("doc_id", "text")
    val frames = graft.llm.Multimodal.sampleFrames(spark,
      graft.llm.Multimodal.assetsFromText(assets, "doc_id", "text"), 16, 32)
      .collect()
    assert(frames.count(_.asset_id == 1L) == 2)
    assert(!frames.exists(_.asset_id == 2L))
    val f0 = frames.find(f => f.asset_id == 1L && f.frame_idx == 0).get
    assert(new String(f0.frame) == "0123456789abcdef")
    val f1 = frames.find(f => f.asset_id == 1L && f.frame_idx == 1).get
    assert(new String(f1.frame) == "XXXXXXXXXXXXXXXX")
  }

  test("languageId: 7 Latin profiles + Han-script short-circuit") {
    import spark.implicits._
    import graft.llm.TextStats
    import org.apache.spark.sql.functions.col
    val samples = Seq(
      ("the cat sat on the mat and looked to the door", "en"),
      ("der hund ist mit der katze auf das feld und nicht allein", "de"),
      ("le chat est dans la maison pour que les souris dorment", "fr"),
      ("el perro es grande y los gatos en la casa para todos con una luz", "es"),
      ("il gatto che dorme per ore non sono come anche il cane", "it"),
      ("o menino viu um gato em que os amigos estavam com mais calma para todos", "pt"),
      ("de jongen ging met het meisje van de stad op weg naar huis niet voor lang", "nl"),
      ("\u8fd9\u662f\u4e00\u6bb5\u4e2d\u6587\u6587\u672c\u7528\u4e8e\u6d4b\u8bd5", "zh"),
      ("xyzzy plugh 12345", "und"))
    val got = samples.toDF("text", "expect")
      .select(col("expect"), TextStats.languageId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0),
      s"expected ${r.getString(0)}, got ${r.getString(1)}"))
  }
}
