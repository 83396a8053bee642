package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * Round 11: the image and audio halves are REAL decoders — javax.imageio
  * (PNG/JPEG/BMP/GIF readers ship with Java SE) for images incl. a
  * bilinear `resizeImage`, and a hand-parsed RIFF/PCM-16 walk for WAV —
  * dispatched per-kind in `extractMediaFeatures`. Only the video demuxer
  * stays a stub (`sampleFrames` — no container codecs in the JDK), and
  * `decodeStub`/`extractFeatures` remain as the deterministic
  * pseudo-feature path for opaque kinds. The Spark-side shape everywhere
  * is mapPartitions — one decoder context per partition, streaming rows,
  * no shuffle.
  */
object Multimodal {

  case class Asset(asset_id: Long, bytes: Array[Byte], kind: String, n_bytes: Long)
  case class AssetFeatures(asset_id: Long, n_bytes: Long, mean_byte: Double,
                           width: Int, height: Int, checksum: Long)

  /** Wrap a text column as a fake binary asset with typed metadata —
    * stands in for reading image blobs from object storage. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("asset_id"),
      col(textCol).cast("binary").as("bytes"),
      lit("fake/image").as("kind"),
      length(col(textCol).cast("binary")).cast("long").as("n_bytes"))

  /** STUB decoder: deterministic pseudo-features of the byte stream.
    * A real implementation would decode pixels here; the Spark-side
    * contract (one decoder per partition, streaming rows) is identical. */
  private def decodeStub(a: Asset): AssetFeatures = {
    var sum = 0L
    var crc = 0L
    var i = 0
    while (i < a.bytes.length) {
      sum += a.bytes(i) & 0xff
      crc = crc * 31 + (a.bytes(i) & 0xff)
      i += 1
    }
    val mean = if (a.bytes.length == 0) 0.0 else sum.toDouble / a.bytes.length
    // fake dims derived from length — a real decoder reads the header
    val w = 16 + (a.n_bytes % 64).toInt
    val h = 16 + (a.n_bytes % 48).toInt
    AssetFeatures(a.asset_id, a.n_bytes, mean, w, h, crc)
  }

  /** Feature extraction over asset partitions. mapPartitions (not a
    * per-row UDF) so a real decoder would amortize init cost per
    * partition; output keeps the input partitioning. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes"), col("kind"), col("n_bytes"))
      .as[Asset]
      .mapPartitions(_.map(decodeStub))
  }

  // ------------------------------------------------------------------
  // REAL decoders — pure-JDK codecs (javax.imageio ships PNG/JPEG/BMP/GIF
  // readers with Java SE; WAV is a hand-parsed RIFF/PCM chunk walk), so
  // the image/audio half of the multimodal path is genuine decode, not a
  // stub. Only video demuxing remains stubbed (no container codecs in
  // the JDK).
  // ------------------------------------------------------------------

  case class MediaFeatures(asset_id: Long, kind: String, ok: Boolean,
    width: Int, height: Int, channels: Int, sample_rate: Int,
    n_frames: Long, mean_luma: Double)

  /** Decode an image container (PNG/JPEG/BMP/GIF) and return
    * (width, height, channels, mean gray value) where gray = (r+g+b)/3
    * per pixel averaged over the raster. */
  def decodeImageBytes(bytes: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    } catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          x += 1
        }
        y += 1
      }
      Some((w, h, img.getColorModel.getNumComponents, sum / (w.toLong * h)))
    }
  }

  /** Encode a solid-color RGB PNG (used by specs and the oracle row —
    * PNG is lossless, so decode returns the exact color back). */
  def encodeSolidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real resize: decode, bilinear-scale with Graphics2D, re-encode PNG. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    } catch { case _: Exception => null }
    if (img == null) None
    else {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, w, h, null)
      g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Encode 16-bit little-endian PCM mono/stereo WAV (RIFF). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Hand-parsed RIFF/WAVE PCM-16 decode:
    * (sampleRate, channels, nFrames, mean |amplitude|). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int) = new String(bytes, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var pos = 12
    var rate = 0; var ch = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val tag = tag4(pos)
      val len = bb.getInt(pos + 4)
      if (tag == "fmt ") {
        if (bb.getShort(pos + 8) != 1) return None // PCM only
        ch = bb.getShort(pos + 10)
        rate = bb.getInt(pos + 12)
        bits = bb.getShort(pos + 22)
      } else if (tag == "data") { dataOff = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1)
    }
    if (rate == 0 || ch == 0 || bits != 16 || dataOff < 0) return None
    val n = math.min(dataLen, bytes.length - dataOff) / 2
    var sum = 0.0
    var i = 0
    while (i < n) { sum += math.abs(bb.getShort(dataOff + i * 2).toInt); i += 1 }
    Some((rate, ch, n.toLong / ch, if (n == 0) 0.0 else sum / n))
  }

  /** Per-partition REAL feature extraction dispatched on the kind column
    * (image kinds via ImageIO, audio/wav via the RIFF parser); undecodable
    * or unknown kinds yield ok=false rows instead of failing the partition.
    * Same mapPartitions shape as extractFeatures — one decoder context
    * per partition, no shuffle. */
  def extractMediaFeatures(spark: SparkSession, assets: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes"), col("kind"), col("n_bytes"))
      .as[Asset]
      .mapPartitions(_.map { a =>
        if (a.kind.startsWith("image/")) decodeImageBytes(a.bytes) match {
          case Some((w, h, c, luma)) =>
            MediaFeatures(a.asset_id, a.kind, ok = true, w, h, c, 0, 0L, luma)
          case None => MediaFeatures(a.asset_id, a.kind, ok = false, 0, 0, 0, 0, 0L, 0.0)
        } else if (a.kind.startsWith("audio/")) decodeWav(a.bytes) match {
          case Some((rate, ch, frames, meanAbs)) =>
            MediaFeatures(a.asset_id, a.kind, ok = true, 0, 0, ch, rate, frames, meanAbs)
          case None => MediaFeatures(a.asset_id, a.kind, ok = false, 0, 0, 0, 0, 0L, 0.0)
        } else MediaFeatures(a.asset_id, a.kind, ok = false, 0, 0, 0, 0, 0L, 0.0)
      })
  }

  /** Encode a grayscale pixel grid (pix(y)(x), 0-255) as RGB PNG. */
  def encodeGrayPng(pix: Array[Array[Int]]): Array[Byte] = {
    val h = pix.length; val w = pix(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = math.max(0, math.min(255, pix(y)(x)))
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit difference hash (dHash, Krawetz's public scheme): decode,
    * bilinear-scale the luma plane to 9x8, set bit y*8+x iff
    * gray(x+1, y) > gray(x, y). Brightness-shift invariant (comparisons
    * only), the standard near-duplicate key for image corpora. */
  def imageDHash64(bytes: Array[Byte]): Option[Long] = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    } catch { case _: Exception => null }
    if (img == null) None
    else {
      val small = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = small.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, 9, 8, null)
      g2.dispose()
      def gray(x: Int, y: Int): Double = {
        val rgb = small.getRGB(x, y)
        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
      }
      var hsh = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (gray(x + 1, y) > gray(x, y)) hsh |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Some(hsh)
    }
  }

  /** In-place iterative radix-2 FFT (re/im double arrays, length a power
    * of two) — the standard published Cooley-Tukey butterfly. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "fft length must be a power of two")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k; val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** 64-bit spectral-shape audio fingerprint over the first 1024 mono
    * PCM-16 frames: FFT, per-bin energies E(1..65), bit m-1 set iff
    * E(m+1) > E(m). Comparison-of-energies structure (the published
    * Haitsma-Kalker robust-hash family), so it is exactly invariant to
    * amplitude scaling and robust to quantization noise. */
  def audioSpectralHash64(wavBytes: Array[Byte]): Option[Long] =
    decodeWav(wavBytes).flatMap { case (_, channels, _, _) =>
      val bb = java.nio.ByteBuffer.wrap(wavBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // find the data chunk again (decodeWav validated the layout)
      def tag4(at: Int) = new String(wavBytes, at, 4, "US-ASCII")
      var pos = 12; var dataOff = -1; var dataLen = 0
      while (pos + 8 <= wavBytes.length && dataOff < 0) {
        val len = bb.getInt(pos + 4)
        if (tag4(pos) == "data") { dataOff = pos + 8; dataLen = len }
        else pos += 8 + len + (len & 1)
      }
      if (dataOff < 0) None
      else {
        val n = 1024
        val re = new Array[Double](n)
        val im = new Array[Double](n)
        val avail = math.min(dataLen, wavBytes.length - dataOff) / 2 / channels
        var i = 0
        while (i < math.min(n, avail)) {
          // average channels to mono
          var s = 0.0
          var c = 0
          while (c < channels) {
            s += bb.getShort(dataOff + (i * channels + c) * 2); c += 1
          }
          re(i) = s / channels
          i += 1
        }
        fft(re, im)
        def energy(m: Int) = re(m) * re(m) + im(m) * im(m)
        var h = 0L
        var m = 1
        while (m <= 64) {
          if (energy(m + 1) > energy(m)) h |= 1L << (m - 1)
          m += 1
        }
        Some(h)
      }
    }

  /** (asset_id, h) dHash fingerprints, decoded per partition; assets that
    * fail to decode are dropped (they cannot near-dup anything). */
  def imageDHashes(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => imageDHash64(b).map((id, _)) })
      .toDF("id", "h")
  }

  /** Image near-duplicate pairs: dHash fingerprints through the same
    * banded-hamming core as text simhash (Dedup.fingerprintPairs64) —
    * only (id, band, bandHash) shuffles, hamming-verified in-bucket. */
  def imageNearDupPairs(spark: SparkSession, assets: DataFrame,
                        maxHamming: Int = 3): DataFrame =
    Dedup.fingerprintPairs64(imageDHashes(spark, assets), maxHamming)

  // ---------------------------------------------------------- video/AVI
  // MJPEG-in-AVI: the one video container fully decodable with pure-JDK
  // pieces — RIFF chunk walk (same discipline as WAV) for the container,
  // ImageIO for each JPEG frame. This upgrades the video half from stub
  // to real demux for MJPEG assets; other codecs remain out of scope (no
  // codec libraries in the JDK).

  /** Solid-gray JPEG frame (the MJPEG payload unit). */
  def encodeSolidJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = math.max(0, math.min(255, gray))
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal RIFF/AVI MJPEG muxer: avih + vids strh/strf headers and a
    * movi LIST of 00dc JPEG chunks (standard public AVI layout). */
  def encodeMjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                     fps: Int = 10): Array[Byte] = {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(tag.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(kind.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val avih = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h)
      chunk("avih", bb.array())
    }
    val strh = {
      val bb = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0).putInt(1).putInt(fps).putInt(0)
        .putInt(frames.length).putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      chunk("strh", bb.array())
    }
    val strf = {
      val bb = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      chunk("strf", bb.array())
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    out.array()
  }

  /** RIFF/AVI demux: walk to the movi LIST and return the 00dc/00db
    * frame payloads in stream order. None if not a RIFF/AVI container. */
  def demuxAviFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int) = new String(bytes, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "AVI ") return None
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val tag = tag4(pos)
        val len = bb.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > to) return
        if (tag == "LIST") {
          val kind = tag4(pos + 8)
          if (kind == "movi" || kind == "hdrl" || kind == "strl")
            walk(pos + 12, pos + 8 + len)
        } else if (tag == "00dc" || tag == "00db") {
          frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        }
        pos += 8 + len + (len & 1)
      }
    }
    walk(12, bytes.length)
    Some(frames.toSeq)
  }

  /** REAL video frame sampling for MJPEG/AVI assets: demux the container
    * in the executor, keep every `everyN`-th frame. Same row-expanding
    * flatMap shape as sampleFrames — frames stay with their asset's
    * partition, no shuffle; non-AVI assets yield zero rows. */
  def sampleVideoFrames(spark: SparkSession, assets: DataFrame,
                        everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        demuxAviFrames(bytes).getOrElse(Seq.empty).zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (f, i) => Frame(id, i, f) }
      }
  }

  case class Frame(asset_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Video-analog frame sampling: one row per sampled frame. The STUB
    * "demuxer" emits every stride-th byte window of length frameSize (a
    * real one would seek keyframes); the plumbing — row-expanding
    * flatMap, frames stay with their asset's partition, no shuffle — is
    * exactly what a production frame sampler does. */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
                   frameSize: Int, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = if (bytes.length < frameSize) 0
                else (bytes.length - frameSize) / stride + 1
        (0 until n).iterator.map(i =>
          Frame(id, i, java.util.Arrays.copyOfRange(bytes, i * stride, i * stride + frameSize)))
      }
  }
}
