package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs as a partition-wise batch operator
  * (`mapPartitions` — the Scala analog of a pandas-UDF `mapInPandas`
  * batch decoder: per-partition init, streaming over rows, no per-row
  * setup cost).
  *
  * Every kernel here is REAL (round 20 — no stubs left):
  *  - Netpbm P6 and RIFF/WAVE PCM are fixed-layout binary formats, so
  *    their decoders are bespoke byte parsers needing no codec library;
  *  - PNG and JPEG ride `javax.imageio` (the JDK's own `java.desktop`
  *    module ships PNG/JPEG/BMP/GIF readers and writers — present in
  *    this zero-egress container, no external jars).
  * The corpus ships no media, so payloads are PLANTED deterministically
  * from doc_id (the txt_pii_scrub discipline: synthesize the input,
  * prove the handling); decoders never see the planting formula — they
  * parse the actual bytes — and the DuckDB oracles predict the channel/
  * sample statistics ARITHMETICALLY from doc_id without seeing the
  * bytes, so a header misparse, stride slip, or truncated read flips
  * the hash. JPEG is lossy, so its roundtrip is spec-gated by tolerance
  * (MultimodalSpec) instead of hash-gated.
  */
object Multimodal {

  /** documents.text re-cast as a binary asset column (the test corpus
    * has no real media; utf-8 bytes stand in for the payload). */
  def assets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
  }

  /** Aspect-preserving fit of (width, height) into a maxDim box — the
    * REAL box rule every resize path shares (integer floor arithmetic,
    * reproduced exactly by DuckDB `//` in the resize oracles). An
    * extreme aspect ratio can floor a dimension to 0; callers reject
    * that loudly (see [[resizePpmNearest]]). */
  def fitBox(width: Int, height: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(width, height)
    if (m <= maxDim) (width, height)
    else (width * maxDim / m, height * maxDim / m)
  }

  // ---- codec-free decode path (round 19): Netpbm P6 is a
  // whitespace-tokenized ASCII header (`P6 <w> <h> <maxval>`) followed
  // by w·h·3 raw RGB bytes, so its decoder is a bespoke byte parser —
  // no codec library involved. Payloads are planted from doc_id; the
  // decoder parses the actual bytes and the DuckDB oracle predicts the
  // channel statistics arithmetically, so a header misparse, an RGB
  // stride slip, or a truncated-read bug flips the hash.

  /** Deterministic P6 payload: w = 4 + id%13, h = 3 + id%7, maxval 255,
    * pixel byte k = (id·31 + k·7) mod 256. */
  def encodePpm(docId: Long): Array[Byte] = {
    val w = 4 + (docId % 13).toInt
    val h = 3 + (docId % 7).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var k = 0
    while (k < px.length) {
      px(k) = ((docId * 31 + k.toLong * 7) % 256).toByte
      k += 1
    }
    header ++ px
  }

  /** Decoded P6 stats: one row per asset. */
  final case class PpmStats(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, maxval: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL P6 header parse: tokenizes the header (whitespace-separated,
    * as the Netpbm spec requires — it never assumes the writer's exact
    * spacing), validates magic/maxval/raster length, and returns
    * (w, h, maxval, rasterOffset). Throws on malformed input — the
    * registered entries' payloads are all valid; an ingest pipeline
    * would wrap this in the quarantine pattern (Ingest.rawFromJsonLines). */
  private def parsePpmHeader(docId: Long, bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"not a P6 payload for doc $docId")
    var i = 2
    def skipWs(): Unit = {
      while (i < bytes.length &&
        (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' || bytes(i) == '\r')) i += 1
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"bad P6 header int for doc $docId at byte $i")
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    // exactly ONE whitespace byte separates maxval from the raster — and
    // it must BE whitespace: 'P6 2 1 255X<raster>' is malformed, not a
    // payload with X as separator. Note '#' header comments (spec-legal)
    // are deliberately REJECTED, not skipped: readInt's digit require
    // trips on '#', so a commented header fails loudly — the planted
    // corpus never writes comments, and an ingest pipeline would route
    // the rejection through the quarantine pattern.
    require(i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\n' ||
      bytes(i) == '\t' || bytes(i) == '\r'),
      s"P6 maxval not followed by a whitespace separator for doc $docId")
    i += 1
    require(maxval == 255, s"unsupported maxval $maxval for doc $docId")
    require(bytes.length - i == w * h * 3,
      s"P6 raster length ${bytes.length - i} != ${w * h * 3} for doc $docId")
    (w, h, maxval, i)
  }

  /** REAL P6 decode: parse + per-channel means from the raw bytes. */
  def decodePpm(docId: Long, bytes: Array[Byte]): PpmStats = {
    val (w, h, maxval, off) = parsePpmHeader(docId, bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    var k = 0
    val n = w * h * 3
    while (k < n) {
      val v = bytes(off + k) & 0xff
      (k % 3: @annotation.switch) match {
        case 0 => sr += v
        case 1 => sg += v
        case _ => sb += v
      }
      k += 1
    }
    val px = (w * h).toDouble
    PpmStats(docId, bytes.length.toLong, w, h, maxval,
      sr / px, sg / px, sb / px)
  }

  /** Resized-raster stats: one row per asset. */
  final case class ResizedStats(
      doc_id: Long, width: Int, height: Int, resized_w: Int, resized_h: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL nearest-neighbor P6 resize — resampling is pure index
    * arithmetic, so like the parser it needs no codec: the output box
    * comes from [[fitBox]]'s aspect-preserving rule (real integer
    * arithmetic, shared with the metadata entry), and each output
    * pixel (x, y) reads input pixel ((x·w) / rw, (y·h) / rh) — floor
    * mapping, the standard NN convention, reproduced exactly by
    * DuckDB's `//` in the oracle. Returns the resized raster's
    * per-channel means (the raster itself never leaves the kernel —
    * the stats are the gateable surface). */
  def resizePpmNearest(docId: Long, bytes: Array[Byte], maxDim: Int): ResizedStats = {
    val (w, h, _, off) = parsePpmHeader(docId, bytes)
    val (rw, rh) = fitBox(w, h, maxDim)
    // a degenerate aspect ratio (e.g. 17×1 into box 8 → rh = 0) must
    // fail loudly like other malformed inputs, not emit 0/0 = NaN means
    require(rw > 0 && rh > 0,
      s"degenerate resize box ${rw}x$rh for doc $docId (input ${w}x$h, maxDim $maxDim)")
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    val n = rw * rh
    while (p < n) {
      val x = p % rw; val y = p / rw
      val xs = x * w / rw; val ys = y * h / rh
      val base = off + 3 * (ys * w + xs)
      sr += bytes(base) & 0xff
      sg += bytes(base + 1) & 0xff
      sb += bytes(base + 2) & 0xff
      p += 1
    }
    val px = n.toDouble
    ResizedStats(docId, w, h, rw, rh, sr / px, sg / px, sb / px)
  }

  // ---- REAL codec path (round 20): PNG/JPEG via javax.imageio — the
  // JDK's java.desktop module ships the codecs, so the jpeg-class
  // kernels that were stubs through round 19 are now real. PNG is
  // LOSSLESS: the planted raster (the SAME per-pixel formula the P6
  // planter uses, so the arithmetic oracles are shared) survives
  // encode→decode bit-for-bit, and the P6 hash-gate discipline
  // transfers directly. JPEG is lossy — spec-gated by tolerance
  // (MultimodalSpec roundtrip), not hash-gated.

  /** Deterministic planted raster, shared by every image planter:
    * w = 4 + id%13, h = 3 + id%7, channel byte k = (id·31 + k·7) mod
    * 256 with k walking R,G,B per pixel in row-major order — exactly
    * [[encodePpm]]'s raster, so the PNG oracles reuse the P6 CTEs. */
  private def plantedImage(docId: Long): java.awt.image.BufferedImage = {
    val w = 4 + (docId % 13).toInt
    val h = 3 + (docId % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val r = ((docId * 31 + (3L * p) * 7) % 256).toInt
      val g = ((docId * 31 + (3L * p + 1) * 7) % 256).toInt
      val b = ((docId * 31 + (3L * p + 2) * 7) % 256).toInt
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    img
  }

  /** Deterministic PNG payload: the planted raster through the JDK's
    * real PNG ENCODER (`ImageIO.write`). Lossless, so the decode side's
    * channel statistics match the planting formula exactly. */
  def encodePng(docId: Long): Array[Byte] = encodeImage(docId, "png")

  /** Planted raster through any ImageIO writer ("png", "jpg", ...). */
  def encodeImage(docId: Long, format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(plantedImage(docId), format, bos),
      s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** REAL image decode via the JDK codec: bytes → BufferedImage →
    * (width, height, row-major R,G,B channel values). Format-agnostic —
    * ImageIO sniffs the container (PNG/JPEG/BMP/GIF). */
  def decodeRaster(docId: Long, bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload for doc $docId")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h * 3)
    var p = 0
    while (p < w * h) {
      val rgb = img.getRGB(p % w, p / w)
      px(3 * p) = (rgb >> 16) & 0xff
      px(3 * p + 1) = (rgb >> 8) & 0xff
      px(3 * p + 2) = rgb & 0xff
      p += 1
    }
    (w, h, px)
  }

  /** Decoded image stats (PNG path): one row per asset. No n_bytes
    * column — unlike P6, the compressed payload length is codec
    * implementation detail, not oracle-predictable arithmetic. */
  final case class ImgStats(
      doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL PNG decode: JDK codec + per-channel means over the raster. */
  def decodeImageStats(docId: Long, bytes: Array[Byte]): ImgStats = {
    val (w, h, px) = decodeRaster(docId, bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < w * h) {
      sr += px(3 * p); sg += px(3 * p + 1); sb += px(3 * p + 2)
      p += 1
    }
    val n = (w * h).toDouble
    ImgStats(docId, w, h, sr / n, sg / n, sb / n)
  }

  /** REAL resize on the decoded raster: [[fitBox]] box rule + the same
    * floor-mapping NN resample as [[resizePpmNearest]], but fed by the
    * JDK codec instead of the P6 byte parser. */
  def resizeImageNearest(docId: Long, bytes: Array[Byte], maxDim: Int): ResizedStats = {
    val (w, h, px) = decodeRaster(docId, bytes)
    val (rw, rh) = fitBox(w, h, maxDim)
    require(rw > 0 && rh > 0,
      s"degenerate resize box ${rw}x$rh for doc $docId (input ${w}x$h, maxDim $maxDim)")
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    val n = rw * rh
    while (p < n) {
      val x = p % rw; val y = p / rw
      val base = 3 * ((y * h / rh) * w + (x * w / rw))
      sr += px(base); sg += px(base + 1); sb += px(base + 2)
      p += 1
    }
    ResizedStats(docId, w, h, rw, rh, sr / n.toDouble, sg / n.toDouble, sb / n.toDouble)
  }

  // ---- REAL audio path (round 20): RIFF/WAVE PCM is a fixed-layout
  // chunked binary format — exactly the P6 situation, no codec needed.
  // The planter writes a spec-complete file (RIFF header, fmt chunk, an
  // odd-sized LIST chunk so the parser's chunk walk + pad-byte handling
  // is exercised on EVERY payload, then the data chunk); the parser
  // walks the chunks for real and de-interleaves 16-bit little-endian
  // stereo samples. Mean amplitude is exact-integer arithmetic; RMS
  // divides an exact long sum-of-squares once and takes one IEEE sqrt,
  // which both engines compute identically (the sim_l2_normalize
  // precedent).

  /** Deterministic stereo PCM samples: n = 64 + id%97 frames at 8 kHz,
    * ch0[t] = (id·37 + t·11) mod 2048 − 1024,
    * ch1[t] = (id·53 + t·17) mod 2048 − 1024. */
  def wavSample(docId: Long, ch: Int, t: Int): Int =
    if (ch == 0) ((docId * 37 + t.toLong * 11) % 2048).toInt - 1024
    else ((docId * 53 + t.toLong * 17) % 2048).toInt - 1024

  /** Deterministic RIFF/WAVE payload from doc_id (see [[wavSample]]). */
  def encodeWav(docId: Long): Array[Byte] = {
    val nFrames = 64 + (docId % 97).toInt
    val bos = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"), 0, s.length)
    def u32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff) }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    val dataSize = nFrames * 2 * 2           // stereo, 16-bit
    val listBody = 7                          // ODD on purpose: pad byte
    // riff size = everything after "RIFF"+size: "WAVE" + fmt(8+16) +
    // LIST(8+7+1 pad) + data(8+dataSize)
    ascii("RIFF"); u32(4 + 24 + (8 + listBody + 1) + (8 + dataSize)); ascii("WAVE")
    ascii("fmt "); u32(16)
    u16(1)                                    // PCM
    u16(2)                                    // channels
    u32(8000)                                 // sample rate
    u32(8000 * 2 * 2)                         // byte rate
    u16(4)                                    // block align
    u16(16)                                   // bits per sample
    ascii("LIST"); u32(listBody)              // junk chunk the parser must skip
    var j = 0
    while (j < listBody) { bos.write(((docId + j) % 256).toInt); j += 1 }
    bos.write(0)                              // pad byte (odd chunk size)
    ascii("data"); u32(dataSize)
    var t = 0
    while (t < nFrames) {
      u16(wavSample(docId, 0, t) & 0xffff)
      u16(wavSample(docId, 1, t) & 0xffff)
      t += 1
    }
    bos.toByteArray
  }

  /** Decoded WAV stats: one row per asset. */
  final case class WavStats(
      doc_id: Long, sample_rate: Int, n_channels: Int, n_samples: Int,
      mean_ch0: Double, mean_ch1: Double, rms_ch0: Double, rms_ch1: Double)

  /** REAL RIFF/WAVE PCM parse: validates the RIFF/WAVE magic, walks the
    * chunk list (unknown chunks skipped with odd-size pad bytes, per
    * spec), parses fmt (requires PCM 16-bit stereo), then de-interleaves
    * the data chunk's little-endian samples. Throws on malformed input —
    * ingest would wrap this in the quarantine pattern. */
  def decodeWav(docId: Long, bytes: Array[Byte]): WavStats = {
    val (sampleRate, dataOff, n) = wavDataRange(docId, bytes)
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    var s0 = 0L; var s1 = 0L; var q0 = 0L; var q1 = 0L
    var t = 0
    while (t < n) {
      val v0 = u16(dataOff + 4 * t).toShort.toInt
      val v1 = u16(dataOff + 4 * t + 2).toShort.toInt
      s0 += v0; s1 += v1; q0 += v0.toLong * v0; q1 += v1.toLong * v1
      t += 1
    }
    WavStats(docId, sampleRate, 2, n,
      s0.toDouble / n, s1.toDouble / n,
      math.sqrt(q0.toDouble / n), math.sqrt(q1.toDouble / n))
  }

  /** The shared RIFF walk behind [[decodeWav]] and [[wavFeatures]]:
    * validates the container + PCM stereo/16-bit layout and returns
    * (sample_rate, data_offset, n_frames). Semantics identical to the
    * original decodeWav walk (unsigned chunk sizes, pad-byte rule,
    * loud failure on malformed or empty payloads). */
  private def wavDataRange(docId: Long, bytes: Array[Byte]): (Int, Int, Int) = {
    def u32(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a RIFF/WAVE payload for doc $docId")
    require(u32(4) == bytes.length - 8,
      s"RIFF size ${u32(4)} != payload ${bytes.length - 8} for doc $docId")
    var i = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      // chunk size is UNSIGNED u32: read through Long so a crafted size
      // with the high bit set fails the overrun check instead of going
      // negative, passing it, and walking the cursor BACKWARDS (an
      // infinite loop in a public decode entry point)
      val szU = u32(i + 4).toLong & 0xffffffffL
      require(i + 8 + szU <= bytes.length,
        s"chunk $id overruns payload for doc $docId")
      val sz = szU.toInt // safe: bounded by bytes.length above
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too short for doc $docId")
          require(u16(i + 8) == 1, s"non-PCM format ${u16(i + 8)} for doc $docId")
          channels = u16(i + 10); sampleRate = u32(i + 12); bits = u16(i + 22)
        case "data" => dataOff = i + 8; dataLen = sz
        case _ => () // unknown chunk: skip
      }
      i += 8 + sz + (sz & 1) // odd-sized chunks carry a pad byte
    }
    require(channels == 2 && bits == 16,
      s"unsupported PCM layout ${channels}ch/${bits}bit for doc $docId")
    require(dataOff >= 0, s"no data chunk for doc $docId")
    require(dataLen % (channels * 2) == 0,
      s"data length $dataLen not frame-aligned for doc $docId")
    val n = dataLen / (channels * 2)
    // fail loudly on an empty data chunk instead of emitting NaN means
    // (0/0) — the resizePpmNearest degenerate-box rule applied to audio
    require(n > 0, s"empty data chunk for doc $docId")
    (sampleRate, dataOff, n)
  }

  /** Decoded WAV feature row: integer-exact signal features. */
  final case class WavFeatures(
      doc_id: Long, n_samples: Int,
      zcr_ch0: Int, zcr_ch1: Int, peak_ch0: Int, peak_ch1: Int)

  /** Audio FEATURE extraction over the real decoded samples: per
    * channel, the zero-crossing count (adjacent sample pairs whose
    * product is strictly negative — the classic voiced/unvoiced and
    * noisiness discriminator) and the peak absolute amplitude. Both
    * are exact integer arithmetic end-to-end, so the oracle gate is a
    * bit-exact replay with no rounding discipline needed at all. */
  def wavFeatures(docId: Long, bytes: Array[Byte]): WavFeatures = {
    val (_, dataOff, n) = wavDataRange(docId, bytes)
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    var z0 = 0; var z1 = 0; var p0 = 0; var p1 = 0
    var l0 = 0; var l1 = 0
    var t = 0
    while (t < n) {
      val v0 = u16(dataOff + 4 * t).toShort.toInt
      val v1 = u16(dataOff + 4 * t + 2).toShort.toInt
      if (t > 0) {
        if (l0.toLong * v0 < 0) z0 += 1
        if (l1.toLong * v1 < 0) z1 += 1
      }
      if (math.abs(v0) > p0) p0 = math.abs(v0)
      if (math.abs(v1) > p1) p1 = math.abs(v1)
      l0 = v0; l1 = v1
      t += 1
    }
    WavFeatures(docId, n, z0, z1, p0, p1)
  }

  /** Perceptual fingerprint row: the 64-bit aHash split into BIGINT
    * halves (bits 32–63 / 0–31) so the DuckDB twin rebuilds it with
    * `1 << p` sums that never overflow a signed 64-bit value. */
  final case class PhashRow(doc_id: Long, phash_hi: Long, phash_lo: Long)

  /** REAL aHash (average-hash) perceptual fingerprint over decoded
    * bytes — the near-dup image signal (the classic 8×8 aHash; LAION-
    * style image dedup groups on exactly this kind of fingerprint):
    * nearest-neighbor-sample the raster to a fixed 8×8 grid, integer
    * grayscale (r+g+b)/3 per cell, threshold each cell against the
    * integer mean of the 64 grays — bit p set iff gray(p) > mean.
    * Integer arithmetic end-to-end, so the oracle replay is bit-exact
    * with no rounding discipline. Brightness-INVARIANT by construction
    * (adding a constant to every pixel shifts cells and mean together
    * — MultimodalSpec pins this with a crafted shifted pair). */
  def phashAHash(docId: Long, bytes: Array[Byte]): PhashRow = {
    val (w, h, _, off) = parsePpmHeader(docId, bytes)
    val gray = new Array[Int](64)
    var sum = 0L
    var p = 0
    while (p < 64) {
      val s = ((p / 8) * h / 8) * w + ((p % 8) * w / 8)
      gray(p) = ((bytes(off + 3 * s) & 0xff) + (bytes(off + 3 * s + 1) & 0xff) +
        (bytes(off + 3 * s + 2) & 0xff)) / 3
      sum += gray(p)
      p += 1
    }
    val mean = sum / 64
    var hi = 0L; var lo = 0L
    p = 0
    while (p < 64) {
      if (gray(p) > mean) {
        if (p >= 32) hi |= 1L << (p - 32) else lo |= 1L << p
      }
      p += 1
    }
    PhashRow(docId, hi, lo)
  }

  /** Resampled-audio feature row. */
  final case class WavResampled(
      doc_id: Long, n_samples: Int, n_out: Int,
      mean_ch0: Double, mean_ch1: Double, peak_ch0: Int, peak_ch1: Int)

  /** REAL time-domain nearest-neighbor resample over the decoded PCM —
    * the audio analog of [[resizePpmNearest]]: output frame j reads
    * source frame (j·n)/nOut (integer floor, the fitBox rule applied
    * to time), so decimation is pure index arithmetic with no filter
    * kernel (a production resampler would band-limit first; NN is the
    * honest minimal variant whose oracle replay is exact). Per-channel
    * mean and peak of the RESAMPLED stream; integer-exact until the
    * one mean division. */
  def resampleWavNearest(docId: Long, bytes: Array[Byte], nOut: Int): WavResampled = {
    require(nOut > 0, s"non-positive resample target $nOut for doc $docId")
    val (_, dataOff, n) = wavDataRange(docId, bytes)
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    var s0 = 0L; var s1 = 0L; var p0 = 0; var p1 = 0
    var j = 0
    while (j < nOut) {
      val t = (j.toLong * n / nOut).toInt
      val v0 = u16(dataOff + 4 * t).toShort.toInt
      val v1 = u16(dataOff + 4 * t + 2).toShort.toInt
      s0 += v0; s1 += v1
      if (math.abs(v0) > p0) p0 = math.abs(v0)
      if (math.abs(v1) > p1) p1 = math.abs(v1)
      j += 1
    }
    WavResampled(docId, n, nOut,
      s0.toDouble / nOut, s1.toDouble / nOut, p0, p1)
  }

  /** Shared aHash frame for the two phash entries: fingerprints
    * computed from the DECODED planted bytes via [[phashAHash]]. */
  private def phashDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id").as[Long]
      .mapPartitions(_.map(id => (id, encodePpm(id)))).toDF("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => phashAHash(id, bytes) })
      .toDF()
  }

  val defs: Map[String, QueryDef] = Map(
    // REAL image decode end-to-end (no stub): deterministic planted P6
    // payloads → the byte-level [[decodePpm]] parser through the
    // mapPartitions batch path → per-channel statistics, hash-gated
    // against an oracle that PREDICTS the stats arithmetically from
    // doc_id without ever seeing the bytes. The decoder tokenizes the
    // header per the Netpbm spec (it does not assume the planter's
    // spacing), so a parse/stride/truncation bug cannot hide.
    "mm_ppm_decode" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodePpm(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => decodePpm(id, bytes) })
          .toDF()
          .select($"doc_id", $"n_bytes", $"width", $"height", $"maxval",
            round($"mean_r", 6).as("mean_r"),
            round($"mean_g", 6).as("mean_g"),
            round($"mean_b", 6).as("mean_b"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        px AS (SELECT doc_id, w, h, unnest(generate_series(0, w*h*3 - 1)) AS k FROM d),
        b AS (SELECT doc_id, w, h, (doc_id*31 + k*7) % 256 AS v, k % 3 AS ch FROM px),
        agg AS (SELECT doc_id, w, h,
                       CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sr,
                       CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sg,
                       CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sb
                FROM b GROUP BY 1, 2, 3)
        SELECT doc_id,
               CAST(strlen('P6' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
                           || chr(10) || '255' || chr(10)) + w*h*3 AS BIGINT) AS n_bytes,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height, 255 AS maxval,
               round(CAST(sr AS DOUBLE) / (w*h), 6) AS mean_r,
               round(CAST(sg AS DOUBLE) / (w*h), 6) AS mean_g,
               round(CAST(sb AS DOUBLE) / (w*h), 6) AS mean_b
        FROM agg"""),
      doc = "REAL Netpbm P6 image decode (codec-free byte parser) through the mapPartitions batch path: planted deterministic payloads, per-channel means hash-gated against an arithmetic oracle that never sees the bytes"),

    // REAL resize end-to-end: decode + nearest-neighbor resample to an
    // 8-px box (aspect-preserving) — resampling is index arithmetic,
    // no codec needed — with the RESIZED raster's channel means gated
    // against the same never-sees-the-bytes arithmetic oracle. Some
    // planted images already fit the box (m ≤ 8) and pass through
    // unscaled, so both branches of the box rule are gated.
    "mm_ppm_resize" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodePpm(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => resizePpmNearest(id, bytes, 8) })
          .toDF()
          .select($"doc_id", $"width", $"height", $"resized_w", $"resized_h",
            round($"mean_r", 6).as("mean_r"),
            round($"mean_g", 6).as("mean_g"),
            round($"mean_b", 6).as("mean_b"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        r AS (SELECT doc_id, w, h,
                     CASE WHEN greatest(w, h) <= 8 THEN w
                          ELSE (w * 8) // greatest(w, h) END AS rw,
                     CASE WHEN greatest(w, h) <= 8 THEN h
                          ELSE (h * 8) // greatest(w, h) END AS rh
              FROM d),
        px AS (SELECT doc_id, w, h, rw, rh, unnest(generate_series(0, rw*rh - 1)) AS p
               FROM r),
        m AS (SELECT doc_id, w, h, rw, rh,
                     ((((p // rw) * h) // rh) * w + (((p % rw) * w) // rw)) AS src_px
              FROM px),
        v AS (SELECT doc_id, w, h, rw, rh,
                     (doc_id*31 + (3*src_px + 0) * 7) % 256 AS vr,
                     (doc_id*31 + (3*src_px + 1) * 7) % 256 AS vg,
                     (doc_id*31 + (3*src_px + 2) * 7) % 256 AS vb
              FROM m),
        agg AS (SELECT doc_id, w, h, rw, rh,
                       CAST(sum(vr) AS BIGINT) AS sr,
                       CAST(sum(vg) AS BIGINT) AS sg,
                       CAST(sum(vb) AS BIGINT) AS sb
                FROM v GROUP BY 1, 2, 3, 4, 5)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(rw AS INT) AS resized_w, CAST(rh AS INT) AS resized_h,
               round(CAST(sr AS DOUBLE) / (rw*rh), 6) AS mean_r,
               round(CAST(sg AS DOUBLE) / (rw*rh), 6) AS mean_g,
               round(CAST(sb AS DOUBLE) / (rw*rh), 6) AS mean_b
        FROM agg"""),
      doc = "REAL nearest-neighbor P6 resize (decode + index-arithmetic resample, codec-free): resized-raster channel means hash-gated against the arithmetic oracle; both box-rule branches exercised"),

    // binary-column metadata: pure relational ops over the payload —
    // byte length, first byte, content digest.
    "mm_binary_meta" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        assets(s, dir).select(
          $"doc_id",
          octet_length($"payload").as("n_bytes"),
          ascii($"payload".cast("string")).as("first_byte"),
          md5($"payload".cast("string")).as("content_md5"))
      },
      oracle = Some("""
        SELECT doc_id,
               strlen(text) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte,
               md5(text) AS content_md5
        FROM documents"""),
      doc = "multimodal: opaque binary payload column + metadata projection"),

    // REAL PNG decode through the JDK codec (round 20 — the former
    // decodeStub entry, retired): planted rasters (the SAME per-pixel
    // formula as the P6 planter) encoded with the real ImageIO PNG
    // WRITER, decoded back with the real READER through the
    // mapPartitions batch path. PNG is lossless, so the byte-blind
    // arithmetic oracle predicts the channel means exactly — an
    // encoder/decoder mismatch, a color-model slip (BGR-vs-RGB), or a
    // raster walk bug flips the hash.
    "mm_png_decode" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodePng(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => decodeImageStats(id, bytes) })
          .toDF()
          .select($"doc_id", $"width", $"height",
            round($"mean_r", 6).as("mean_r"),
            round($"mean_g", 6).as("mean_g"),
            round($"mean_b", 6).as("mean_b"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        px AS (SELECT doc_id, w, h, unnest(generate_series(0, w*h*3 - 1)) AS k FROM d),
        b AS (SELECT doc_id, w, h, (doc_id*31 + k*7) % 256 AS v, k % 3 AS ch FROM px),
        agg AS (SELECT doc_id, w, h,
                       CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sr,
                       CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sg,
                       CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sb
                FROM b GROUP BY 1, 2, 3)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               round(CAST(sr AS DOUBLE) / (w*h), 6) AS mean_r,
               round(CAST(sg AS DOUBLE) / (w*h), 6) AS mean_g,
               round(CAST(sb AS DOUBLE) / (w*h), 6) AS mean_b
        FROM agg"""),
      doc = "REAL PNG decode via the JDK's ImageIO codec (java.desktop): planted rasters encoded+decoded through the real PNG writer/reader, channel means hash-gated against the byte-blind arithmetic oracle (lossless, so exact)"),

    // REAL PNG resize (the former resize-stub entry, retired): JDK
    // codec decode + the shared fitBox/NN-floor resample, resized-raster
    // means hash-gated against the same arithmetic oracle as
    // mm_ppm_resize (identical planted raster). Both box-rule branches
    // exercised (m <= 8 passes through unscaled).
    "mm_png_resize" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodePng(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => resizeImageNearest(id, bytes, 8) })
          .toDF()
          .select($"doc_id", $"width", $"height", $"resized_w", $"resized_h",
            round($"mean_r", 6).as("mean_r"),
            round($"mean_g", 6).as("mean_g"),
            round($"mean_b", 6).as("mean_b"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        r AS (SELECT doc_id, w, h,
                     CASE WHEN greatest(w, h) <= 8 THEN w
                          ELSE (w * 8) // greatest(w, h) END AS rw,
                     CASE WHEN greatest(w, h) <= 8 THEN h
                          ELSE (h * 8) // greatest(w, h) END AS rh
              FROM d),
        px AS (SELECT doc_id, w, h, rw, rh, unnest(generate_series(0, rw*rh - 1)) AS p
               FROM r),
        m AS (SELECT doc_id, w, h, rw, rh,
                     ((((p // rw) * h) // rh) * w + (((p % rw) * w) // rw)) AS src_px
              FROM px),
        v AS (SELECT doc_id, w, h, rw, rh,
                     (doc_id*31 + (3*src_px + 0) * 7) % 256 AS vr,
                     (doc_id*31 + (3*src_px + 1) * 7) % 256 AS vg,
                     (doc_id*31 + (3*src_px + 2) * 7) % 256 AS vb
              FROM m),
        agg AS (SELECT doc_id, w, h, rw, rh,
                       CAST(sum(vr) AS BIGINT) AS sr,
                       CAST(sum(vg) AS BIGINT) AS sg,
                       CAST(sum(vb) AS BIGINT) AS sb
                FROM v GROUP BY 1, 2, 3, 4, 5)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               CAST(rw AS INT) AS resized_w, CAST(rh AS INT) AS resized_h,
               round(CAST(sr AS DOUBLE) / (rw*rh), 6) AS mean_r,
               round(CAST(sg AS DOUBLE) / (rw*rh), 6) AS mean_g,
               round(CAST(sb AS DOUBLE) / (rw*rh), 6) AS mean_b
        FROM agg"""),
      doc = "REAL PNG resize: JDK codec decode + shared fitBox/NN-floor resample, resized-raster channel means hash-gated against the arithmetic oracle; both box-rule branches exercised"),

    // REAL WAV decode, codec-free (round 20): RIFF/WAVE PCM is a
    // fixed-layout chunked binary format — planted spec-complete files
    // (including an odd-sized junk chunk so the chunk walk + pad-byte
    // rule is exercised on every payload) parsed by the real byte-level
    // chunk walker, stereo 16-bit samples de-interleaved; per-channel
    // mean amplitude and RMS hash-gated against the byte-blind
    // arithmetic oracle (exact long sums; one IEEE sqrt on identical
    // operands per row).
    "mm_wav_decode" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodeWav(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => decodeWav(id, bytes) })
          .toDF()
          .select($"doc_id", $"sample_rate", $"n_channels", $"n_samples",
            round($"mean_ch0", 6).as("mean_ch0"),
            round($"mean_ch1", 6).as("mean_ch1"),
            round($"rms_ch0", 6).as("rms_ch0"),
            round($"rms_ch1", 6).as("rms_ch1"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 64 + doc_id % 97 AS n FROM documents),
        t AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS t FROM d),
        v AS (SELECT doc_id, n,
                     (doc_id*37 + t*11) % 2048 - 1024 AS v0,
                     (doc_id*53 + t*17) % 2048 - 1024 AS v1
              FROM t),
        agg AS (SELECT doc_id, n,
                       CAST(sum(v0) AS BIGINT) AS s0, CAST(sum(v1) AS BIGINT) AS s1,
                       CAST(sum(v0*v0) AS BIGINT) AS q0, CAST(sum(v1*v1) AS BIGINT) AS q1
                FROM v GROUP BY 1, 2)
        SELECT doc_id, 8000 AS sample_rate, 2 AS n_channels, CAST(n AS INT) AS n_samples,
               round(CAST(s0 AS DOUBLE) / n, 6) AS mean_ch0,
               round(CAST(s1 AS DOUBLE) / n, 6) AS mean_ch1,
               round(sqrt(CAST(q0 AS DOUBLE) / n), 6) AS rms_ch0,
               round(sqrt(CAST(q1 AS DOUBLE) / n), 6) AS rms_ch1
        FROM agg"""),
      doc = "REAL RIFF/WAVE PCM decode (codec-free chunk walker, pad-byte rule exercised on every payload): per-channel mean amplitude + RMS hash-gated against the byte-blind arithmetic oracle"),

    // audio FEATURE extraction over the same real decode path:
    // zero-crossing count + peak amplitude per channel — exact integer
    // arithmetic end-to-end (no rounding discipline needed), so the
    // byte-blind oracle replays the planted PCM and the lag-product
    // sign test bit-for-bit. Same partition-wise no-shuffle shape as
    // mm_wav_decode.
    "mm_wav_features" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodeWav(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => wavFeatures(id, bytes) })
          .toDF()
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 64 + doc_id % 97 AS n FROM documents),
        ts AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS t FROM d),
        v AS (SELECT doc_id, n, t,
                     (doc_id*37 + t*11) % 2048 - 1024 AS v0,
                     (doc_id*53 + t*17) % 2048 - 1024 AS v1
              FROM ts),
        l AS (SELECT doc_id, n, v0, v1,
                     lag(v0) OVER (PARTITION BY doc_id ORDER BY t) AS p0,
                     lag(v1) OVER (PARTITION BY doc_id ORDER BY t) AS p1
              FROM v)
        SELECT doc_id, CAST(max(n) AS INT) AS n_samples,
               CAST(sum(CASE WHEN p0 * v0 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr_ch0,
               CAST(sum(CASE WHEN p1 * v1 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zcr_ch1,
               CAST(max(abs(v0)) AS INT) AS peak_ch0,
               CAST(max(abs(v1)) AS INT) AS peak_ch1
        FROM l GROUP BY 1"""),
      doc = "audio features over the real WAV decode: per-channel zero-crossing count + peak amplitude, integer-exact end-to-end against the byte-blind arithmetic oracle"),

    // frame sampling: the video path — split the payload into fixed-size
    // chunks ("frames"), keep every 4th, fingerprint each. The explode
    // shape (1 asset row → n frame rows) is the real plumbing a video
    // sampler needs; partitioning carries over from the asset scan.
    "mm_frame_sample" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .filter(length($"text") > 0) // sequence(0,-1) would be [0,-1]
          .select($"doc_id", $"text",
            explode(expr("sequence(0, CAST(ceil(length(text) / 64.0) AS INT) - 1)")).as("chunk_idx"))
          .filter($"chunk_idx" % 4 === 0)
          .select($"doc_id", $"chunk_idx".as("frame_idx"),
            md5(expr("substr(text, chunk_idx * 64 + 1, 64)")).as("frame_md5"))
      },
      oracle = Some("""
        SELECT doc_id, chunk_idx AS frame_idx,
               md5(substr(text, chunk_idx * 64 + 1, 64)) AS frame_md5
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0, CAST(ceil(strlen(text) / 64.0) AS INT) - 1)) AS chunk_idx) c
        WHERE chunk_idx % 4 = 0 AND strlen(text) > 0"""),
      doc = "multimodal: frame sampling (1→n explode, every 4th 64-byte chunk)"),

    // perceptual-hash image dedup: the multimodal member of the dedup
    // family — aHash fingerprints computed from the DECODED BYTES
    // through the real parser (planted payloads, byte-blind arithmetic
    // oracle: the mm_ppm discipline), then exact grouping on the
    // 64-bit hash with the keep-first keeper convention of dedup_exact.
    // ONE shuffle on an 8-byte key — at 100 TB this is the same
    // single-shuffle bound as dedup_exact, and the hash computation is
    // a partition-wise scan (no shuffle at all). Grouping EXACT hashes
    // is the standard web-scale image-dedup deployment (near-dups in
    // hash space collapse to equal aHashes by construction); a
    // Hamming-banded variant would ride dedup_simhash's band machinery
    // unchanged if a looser radius were wanted. Non-vacuous at both
    // gated SFs: 500 docs → 413 distinct hashes (87 dup rows).
    "mm_phash_dedup" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val ph = phashDf(s, dir)
        val w = Window.partitionBy($"phash_hi", $"phash_lo")
        ph.select($"doc_id", $"phash_hi", $"phash_lo")
          .withColumn("keeper", min($"doc_id").over(w))
          .withColumn("is_dup", $"doc_id" =!= $"keeper")
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        g AS (SELECT doc_id, w, h, unnest(generate_series(0, 63)) AS p FROM d),
        m AS (SELECT doc_id, p,
                     (((p // 8) * h) // 8) * w + (((p % 8) * w) // 8) AS src_px
              FROM g),
        gr AS (SELECT doc_id, p,
                      (((doc_id*31 + (3*src_px + 0)*7) % 256)
                     + ((doc_id*31 + (3*src_px + 1)*7) % 256)
                     + ((doc_id*31 + (3*src_px + 2)*7) % 256)) // 3 AS gray
               FROM m),
        mn AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) // 64 AS mean FROM gr GROUP BY 1),
        ph AS (SELECT gr.doc_id,
                      CAST(sum(CASE WHEN gray > mean AND p >= 32 THEN CAST(1 AS BIGINT) << (p - 32) ELSE 0 END) AS BIGINT) AS phash_hi,
                      CAST(sum(CASE WHEN gray > mean AND p < 32 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS phash_lo
               FROM gr JOIN mn USING (doc_id) GROUP BY 1)
        SELECT doc_id, phash_hi, phash_lo,
               min(doc_id) OVER (PARTITION BY phash_hi, phash_lo) AS keeper,
               doc_id <> min(doc_id) OVER (PARTITION BY phash_hi, phash_lo) AS is_dup
        FROM ph"""),
      doc = "perceptual-hash image dedup: REAL 8x8 aHash over the decoded planted rasters (byte parser, byte-blind arithmetic oracle), exact-hash grouping with the keep-first keeper — the dedup_exact single-shuffle shape on an 8-byte key; 87 dup rows at the gated SFs"),

    // NEAR-dup image pairs: the dedup_simhash banding discipline on
    // the aHash — 4 bands of 16 bits, candidates where any band
    // matches, Hamming verified on the candidate set only. Threshold 3
    // < band count, so by pigeonhole every true pair shares at least
    // one unchanged band: the band-blocked candidate set PROVABLY
    // covers the exhaustive answer, and the oracle IS the exhaustive
    // O(n²) pair scan — banded ≡ exhaustive is hash-proven per round
    // (exactly dedup_simhash's gate shape). At 100 TB the band join is
    // the only shuffle and candidates stay ~|near-dups|, never n².
    "mm_phash_near_pairs" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val banded = phashDf(s, dir)
          .select($"doc_id", $"phash_hi", $"phash_lo",
            explode(expr("sequence(0, 3)")).as("band"))
          .withColumn("bv", expr(
            """CASE band WHEN 0 THEN phash_lo & 65535
                         WHEN 1 THEN (phash_lo >> 16) & 65535
                         WHEN 2 THEN phash_hi & 65535
                         ELSE (phash_hi >> 16) & 65535 END"""))
        val a = banded.select($"doc_id".as("a_id"), $"phash_hi".as("ha_hi"),
          $"phash_lo".as("ha_lo"), $"band", $"bv")
        val b = banded.select($"doc_id".as("b_id"), $"phash_hi".as("hb_hi"),
          $"phash_lo".as("hb_lo"), $"band", $"bv")
        a.join(b, Seq("band", "bv"))
          .filter($"a_id" < $"b_id")
          .select($"a_id", $"b_id",
            (expr("bit_count(ha_hi ^ hb_hi)") + expr("bit_count(ha_lo ^ hb_lo)"))
              .cast("int").as("hamming"))
          .filter($"hamming" <= 3)
          .distinct() // a pair may collide in several bands
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        g AS (SELECT doc_id, w, h, unnest(generate_series(0, 63)) AS p FROM d),
        m AS (SELECT doc_id, p,
                     (((p // 8) * h) // 8) * w + (((p % 8) * w) // 8) AS src_px
              FROM g),
        gr AS (SELECT doc_id, p,
                      (((doc_id*31 + (3*src_px + 0)*7) % 256)
                     + ((doc_id*31 + (3*src_px + 1)*7) % 256)
                     + ((doc_id*31 + (3*src_px + 2)*7) % 256)) // 3 AS gray
               FROM m),
        mn AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) // 64 AS mean FROM gr GROUP BY 1),
        ph AS (SELECT gr.doc_id,
                      CAST(sum(CASE WHEN gray > mean AND p >= 32 THEN CAST(1 AS BIGINT) << (p - 32) ELSE 0 END) AS BIGINT) AS phash_hi,
                      CAST(sum(CASE WHEN gray > mean AND p < 32 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS phash_lo
               FROM gr JOIN mn USING (doc_id) GROUP BY 1)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(bit_count(xor(a.phash_hi, b.phash_hi))
                  + bit_count(xor(a.phash_lo, b.phash_lo)) AS INT) AS hamming
        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash_hi, b.phash_hi))
            + bit_count(xor(a.phash_lo, b.phash_lo)) <= 3"""),
      doc = "perceptual near-dup image pairs: 4x16-bit band-blocked aHash candidates verified at Hamming<=3 (pigeonhole: threshold < bands, so banding provably misses nothing) — oracle is the exhaustive O(n^2) pair scan, banded ≡ exhaustive hash-proven per round"),

    // time-domain resample: the audio analog of mm_ppm_resize —
    // decimate every planted WAV to a fixed 48-frame output via the
    // NN floor map (every payload has 64–160 frames, so this is
    // always a strict downsample and the source index never
    // overflows), features on the RESAMPLED stream gated against the
    // byte-blind arithmetic replay. Partition-wise scan, no shuffle.
    "mm_wav_resample" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodeWav(id)))).toDF("doc_id", "payload")
        payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => resampleWavNearest(id, bytes, 48) })
          .toDF()
          .select($"doc_id", $"n_samples", $"n_out",
            round($"mean_ch0", 6).as("mean_ch0"),
            round($"mean_ch1", 6).as("mean_ch1"),
            $"peak_ch0", $"peak_ch1")
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 64 + doc_id % 97 AS n FROM documents),
        jf AS (SELECT doc_id, n, unnest(generate_series(0, 47)) AS j FROM d),
        v AS (SELECT doc_id, n,
                     (doc_id*37 + ((j * n) // 48)*11) % 2048 - 1024 AS v0,
                     (doc_id*53 + ((j * n) // 48)*17) % 2048 - 1024 AS v1
              FROM jf),
        agg AS (SELECT doc_id, n,
                       CAST(sum(v0) AS BIGINT) AS s0, CAST(sum(v1) AS BIGINT) AS s1,
                       max(abs(v0)) AS p0, max(abs(v1)) AS p1
                FROM v GROUP BY 1, 2)
        SELECT doc_id, CAST(n AS INT) AS n_samples, 48 AS n_out,
               round(CAST(s0 AS DOUBLE) / 48, 6) AS mean_ch0,
               round(CAST(s1 AS DOUBLE) / 48, 6) AS mean_ch1,
               CAST(p0 AS INT) AS peak_ch0, CAST(p1 AS INT) AS peak_ch1
        FROM agg"""),
      doc = "REAL NN audio resample over the decoded PCM (the fitBox floor rule applied to time): fixed 48-frame decimation, resampled-stream mean/peak per channel hash-gated against the byte-blind arithmetic oracle"),

    // the composed multimodal pipeline — pipe_corpus_end2end's shape
    // for the image path: decode → perceptual keep-first dedup →
    // resize feature extraction, one row per KEPT image carrying both
    // the original and resized channel statistics. Stage composition
    // is where silent drift hides (a keeper set computed on one hash,
    // features on another); gating the composed output pins the
    // stages TOGETHER, not just separately. All stages are
    // partition-wise scans; the only shuffle is the phash keeper
    // grouping (8-byte key) and the two doc_id equi-joins.
    "pipe_mm_end2end" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"phash_hi", $"phash_lo")
        val keepers = phashDf(s, dir)
          .withColumn("keeper", min($"doc_id").over(w))
          .filter($"doc_id" === $"keeper").select($"doc_id")
        val payloads = Tables.documents(s, dir).select($"doc_id").as[Long]
          .mapPartitions(_.map(id => (id, encodePpm(id)))).toDF("doc_id", "payload")
        val dec = payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => decodePpm(id, bytes) })
          .toDF()
          .select($"doc_id", $"width", $"height",
            round($"mean_r", 6).as("mean_r"),
            round($"mean_g", 6).as("mean_g"),
            round($"mean_b", 6).as("mean_b"))
        val rez = payloads.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) => resizePpmNearest(id, bytes, 8) })
          .toDF()
          .select($"doc_id", $"resized_w", $"resized_h",
            round($"mean_r", 6).as("rz_mean_r"),
            round($"mean_g", 6).as("rz_mean_g"),
            round($"mean_b", 6).as("rz_mean_b"))
        keepers.join(dec, Seq("doc_id")).join(rez, Seq("doc_id"))
      },
      oracle = Some("""
        WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h FROM documents),
        hg AS (SELECT doc_id, w, h, unnest(generate_series(0, 63)) AS p FROM d),
        hm AS (SELECT doc_id, p,
                      (((p // 8) * h) // 8) * w + (((p % 8) * w) // 8) AS src_px
               FROM hg),
        hgr AS (SELECT doc_id, p,
                       (((doc_id*31 + (3*src_px + 0)*7) % 256)
                      + ((doc_id*31 + (3*src_px + 1)*7) % 256)
                      + ((doc_id*31 + (3*src_px + 2)*7) % 256)) // 3 AS gray
                FROM hm),
        hmn AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) // 64 AS mean FROM hgr GROUP BY 1),
        ph AS (SELECT hgr.doc_id,
                      CAST(sum(CASE WHEN gray > mean AND p >= 32 THEN CAST(1 AS BIGINT) << (p - 32) ELSE 0 END) AS BIGINT) AS phash_hi,
                      CAST(sum(CASE WHEN gray > mean AND p < 32 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS phash_lo
               FROM hgr JOIN hmn USING (doc_id) GROUP BY 1),
        keep AS (SELECT doc_id FROM
                   (SELECT doc_id, min(doc_id) OVER (PARTITION BY phash_hi, phash_lo) AS keeper FROM ph)
                 WHERE doc_id = keeper),
        dpx AS (SELECT doc_id, w, h, unnest(generate_series(0, w*h*3 - 1)) AS k FROM d),
        db AS (SELECT doc_id, w, h, (doc_id*31 + k*7) % 256 AS v, k % 3 AS ch FROM dpx),
        dagg AS (SELECT doc_id, w, h,
                        CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sr,
                        CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sg,
                        CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sb
                 FROM db GROUP BY 1, 2, 3),
        r AS (SELECT doc_id, w, h,
                     CASE WHEN greatest(w, h) <= 8 THEN w
                          ELSE (w * 8) // greatest(w, h) END AS rw,
                     CASE WHEN greatest(w, h) <= 8 THEN h
                          ELSE (h * 8) // greatest(w, h) END AS rh
              FROM d),
        rpx AS (SELECT doc_id, w, h, rw, rh, unnest(generate_series(0, rw*rh - 1)) AS p FROM r),
        rm AS (SELECT doc_id, w, h, rw, rh,
                      ((((p // rw) * h) // rh) * w + (((p % rw) * w) // rw)) AS src_px
               FROM rpx),
        rv AS (SELECT doc_id, rw, rh,
                      (doc_id*31 + (3*src_px + 0) * 7) % 256 AS vr,
                      (doc_id*31 + (3*src_px + 1) * 7) % 256 AS vg,
                      (doc_id*31 + (3*src_px + 2) * 7) % 256 AS vb
               FROM rm),
        ragg AS (SELECT doc_id, rw, rh,
                        CAST(sum(vr) AS BIGINT) AS sr, CAST(sum(vg) AS BIGINT) AS sg,
                        CAST(sum(vb) AS BIGINT) AS sb
                 FROM rv GROUP BY 1, 2, 3)
        SELECT k.doc_id,
               CAST(da.w AS INT) AS width, CAST(da.h AS INT) AS height,
               round(CAST(da.sr AS DOUBLE) / (da.w*da.h), 6) AS mean_r,
               round(CAST(da.sg AS DOUBLE) / (da.w*da.h), 6) AS mean_g,
               round(CAST(da.sb AS DOUBLE) / (da.w*da.h), 6) AS mean_b,
               CAST(ra.rw AS INT) AS resized_w, CAST(ra.rh AS INT) AS resized_h,
               round(CAST(ra.sr AS DOUBLE) / (ra.rw*ra.rh), 6) AS rz_mean_r,
               round(CAST(ra.sg AS DOUBLE) / (ra.rw*ra.rh), 6) AS rz_mean_g,
               round(CAST(ra.sb AS DOUBLE) / (ra.rw*ra.rh), 6) AS rz_mean_b
        FROM keep k JOIN dagg da USING (doc_id) JOIN ragg ra USING (doc_id)"""),
      doc = "composed multimodal pipeline (pipe_corpus_end2end's shape for images): decode -> perceptual keep-first dedup -> NN resize features, one row per kept image with original + resized channel stats — the composed output hash-gated so the stages are pinned together, not just separately")
  )
}
