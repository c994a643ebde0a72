package graft

import graft.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the REAL Netpbm P6 decoder (round 19 — the first
  * non-stub kernel in the multimodal family): spec-level parser checks
  * the oracle gate can't express, because the planted corpus payloads
  * all share one writer's formatting while the Netpbm spec allows any
  * whitespace tokenization.
  */
class MultimodalSpec extends AnyFunSuite {

  private def ppm(header: String, px: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ px

  test("decodePpm parses spec-legal header variants identically") {
    // 2×1 image, pixels (1,2,3),(250,251,252)
    val px = Array[Byte](1, 2, 3, 250.toByte, 251.toByte, 252.toByte)
    val variants = Seq(
      "P6\n2 1\n255\n",          // the planter's spacing
      "P6 2 1 255\n",            // single-line, single spaces
      "P6\t2\r\n1  255 ",        // mixed whitespace runs, space terminator
      "P6\n\n2\n1\n255\n")       // newline-separated everything
    val decoded = variants.map(h => Multimodal.decodePpm(7L, ppm(h, px)))
    decoded.foreach { d =>
      assert(d.width == 2 && d.height == 1 && d.maxval == 255)
      assert(d.mean_r == (1 + 250) / 2.0 && d.mean_g == (2 + 251) / 2.0 &&
        d.mean_b == (3 + 252) / 2.0, s"channel stride wrong: $d")
    }
    // n_bytes tracks the actual payload, which differs per header
    assert(decoded.map(_.n_bytes).distinct.size > 1)
  }

  test("decodePpm rejects malformed payloads loudly") {
    val px = Array[Byte](0, 0, 0)
    assertThrows[IllegalArgumentException](
      Multimodal.decodePpm(1L, ppm("P5\n1 1\n255\n", px)))     // wrong magic
    assertThrows[IllegalArgumentException](
      Multimodal.decodePpm(1L, ppm("P6\n1 1\n65535\n", px)))   // unsupported maxval
    assertThrows[IllegalArgumentException](
      Multimodal.decodePpm(1L, ppm("P6\n2 2\n255\n", px)))     // truncated raster
    assertThrows[IllegalArgumentException](
      Multimodal.decodePpm(1L, ppm("P6\nx 1\n255\n", px)))     // non-numeric dim
    // the byte after maxval must BE whitespace — 'X' is not a separator
    // (the raster below is sized so only misparse could succeed)
    assertThrows[IllegalArgumentException](
      Multimodal.decodePpm(1L, ppm("P6 1 1 255X", px)))
    // '#' header comments are spec-legal but deliberately REJECTED
    // (documented in parsePpmHeader), never silently misparsed
    assertThrows[IllegalArgumentException](
      Multimodal.decodePpm(1L, ppm("P6\n# a comment\n1 1\n255\n", px)))
  }

  test("resizePpmNearest rejects a degenerate output box loudly") {
    // 17×1 into box 8: rh = 1·8/17 = 0 — must throw, not emit NaN means
    val px = new Array[Byte](17 * 3)
    assertThrows[IllegalArgumentException](
      Multimodal.resizePpmNearest(3L, ppm("P6\n17 1\n255\n", px), 8))
  }

  test("resizePpmNearest: hand-checked NN mapping; pass-through box equals decode") {
    // 4×1 image, pixels P0..P3 with distinct channel values
    val px = (0 until 12).map(_.toByte).toArray // P0=(0,1,2) P1=(3,4,5) P2=(6,7,8) P3=(9,10,11)
    val img = ppm("P6\n4 1\n255\n", px)
    // box 2: rw = 4·2/4 = 2, rh = 1·2/4 = 0? — fitBox: h·maxDim/m = 1·2/4 = 0…
    // use box 2 on 4×2 instead: rw = 2, rh = 1; NN picks x∈{0,2}, y=0
    val px2 = (0 until 24).map(_.toByte).toArray // row0: P0..P3, row1: P4..P7
    val img2 = ppm("P6\n4 2\n255\n", px2)
    val r = Multimodal.resizePpmNearest(5L, img2, 2)
    assert(r.resized_w == 2 && r.resized_h == 1, s"box rule wrong: $r")
    // output pixels = input (0,0)=(0,1,2) and (2,0)=(6,7,8)
    assert(r.mean_r == (0 + 6) / 2.0 && r.mean_g == (1 + 7) / 2.0 &&
      r.mean_b == (2 + 8) / 2.0, s"NN mapping wrong: $r")
    // pass-through: a box the image already fits leaves means = decode's
    val d = Multimodal.decodePpm(5L, img)
    val s = Multimodal.resizePpmNearest(5L, img, 16)
    assert(s.resized_w == 4 && s.resized_h == 1 &&
      s.mean_r == d.mean_r && s.mean_g == d.mean_g && s.mean_b == d.mean_b)
  }

  test("encode→decode roundtrip matches the planted formula") {
    val id = 42L
    val d = Multimodal.decodePpm(id, Multimodal.encodePpm(id))
    assert(d.width == 4 + (id % 13).toInt && d.height == 3 + (id % 7).toInt)
    val n = d.width * d.height * 3
    val expected = (0 until n).map(k => ((id * 31 + k * 7) % 256).toInt)
    def mean(ch: Int) =
      expected.zipWithIndex.collect { case (v, k) if k % 3 == ch => v }
        .sum.toDouble / (d.width * d.height)
    assert(d.mean_r == mean(0) && d.mean_g == mean(1) && d.mean_b == mean(2))
  }

  // ---- round 20: the JDK-codec (javax.imageio) and WAV kernels

  private def plantedMean(id: Long, ch: Int): Double = {
    val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
    (0 until w * h * 3).collect { case k if k % 3 == ch => ((id * 31 + k * 7) % 256).toInt }
      .sum.toDouble / (w * h)
  }

  test("PNG roundtrip through the real JDK codec is lossless and matches the planted formula") {
    for (id <- Seq(0L, 7L, 42L, 101L)) {
      val d = Multimodal.decodeImageStats(id, Multimodal.encodePng(id))
      assert(d.width == 4 + (id % 13).toInt && d.height == 3 + (id % 7).toInt)
      assert(d.mean_r == plantedMean(id, 0) && d.mean_g == plantedMean(id, 1) &&
        d.mean_b == plantedMean(id, 2), s"PNG channel means drifted for id $id: $d")
    }
    // PNG decode ≡ P6 decode of the same planted raster — two REAL
    // decoders (JDK codec vs byte parser) agreeing on one source
    val id = 55L
    val png = Multimodal.decodeImageStats(id, Multimodal.encodePng(id))
    val p6 = Multimodal.decodePpm(id, Multimodal.encodePpm(id))
    assert(png.mean_r == p6.mean_r && png.mean_g == p6.mean_g && png.mean_b == p6.mean_b)
  }

  test("PNG NN resize equals the P6 NN resize on the same planted raster") {
    for (id <- Seq(3L, 12L, 90L)) { // mixes scaled and pass-through boxes
      val a = Multimodal.resizeImageNearest(id, Multimodal.encodePng(id), 8)
      val b = Multimodal.resizePpmNearest(id, Multimodal.encodePpm(id), 8)
      assert(a == b, s"codec resize diverged from byte-parser resize for id $id: $a vs $b")
    }
  }

  test("JPEG roundtrip: real lossy codec — exact dims, channel means within tolerance") {
    for (id <- Seq(9L, 42L, 77L)) {
      val bytes = Multimodal.encodeImage(id, "jpg")
      // sanity: it really is a JPEG container (SOI marker), not a PNG
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "missing JPEG SOI")
      val d = Multimodal.decodeImageStats(id, bytes)
      assert(d.width == 4 + (id % 13).toInt && d.height == 3 + (id % 7).toInt)
      // lossy: means drift but must stay near the planted raster's
      for ((got, want) <- Seq(d.mean_r -> plantedMean(id, 0),
          d.mean_g -> plantedMean(id, 1), d.mean_b -> plantedMean(id, 2)))
        assert(math.abs(got - want) < 16.0,
          s"JPEG mean too far off for id $id: got $got want $want")
    }
  }

  test("decodeImageStats rejects undecodable bytes loudly") {
    assertThrows[IllegalArgumentException](
      Multimodal.decodeImageStats(1L, Array[Byte](1, 2, 3, 4)))
  }

  test("WAV roundtrip matches the planted sample formula; junk chunk + pad byte are walked") {
    for (id <- Seq(0L, 5L, 96L, 200L)) {
      val d = Multimodal.decodeWav(id, Multimodal.encodeWav(id))
      val n = 64 + (id % 97).toInt
      assert(d.sample_rate == 8000 && d.n_channels == 2 && d.n_samples == n)
      def stats(ch: Int): (Double, Double) = {
        val vs = (0 until n).map(t => Multimodal.wavSample(id, ch, t))
        (vs.sum.toDouble / n,
          math.sqrt(vs.map(v => v.toLong * v).sum.toDouble / n))
      }
      val (m0, r0) = stats(0); val (m1, r1) = stats(1)
      assert(d.mean_ch0 == m0 && d.mean_ch1 == m1, s"WAV means drifted for id $id: $d")
      assert(d.rms_ch0 == r0 && d.rms_ch1 == r1, s"WAV rms drifted for id $id: $d")
    }
  }

  test("decodeWav hand-check: crafted file with known samples, negative values exact") {
    // 2 frames: ch0 = [-1, 300], ch1 = [2, -300]
    def le16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = "fmt ".getBytes("US-ASCII").toSeq ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)
    val data = "data".getBytes("US-ASCII").toSeq ++ le32(8) ++
      le16(-1 & 0xffff) ++ le16(2) ++ le16(300) ++ le16(-300 & 0xffff)
    val body = "WAVE".getBytes("US-ASCII").toSeq ++ fmt ++ data
    val wav = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(body.size) ++ body).toArray
    val d = Multimodal.decodeWav(1L, wav)
    assert(d.n_samples == 2 && d.mean_ch0 == (-1 + 300) / 2.0 &&
      d.mean_ch1 == (2 - 300) / 2.0, s"hand-check failed: $d")
    assert(d.rms_ch0 == math.sqrt((1.0 + 300.0 * 300.0) / 2) &&
      d.rms_ch1 == math.sqrt((4.0 + 300.0 * 300.0) / 2))
  }

  test("decodeWav rejects malformed payloads loudly") {
    val good = Multimodal.encodeWav(7L)
    assertThrows[IllegalArgumentException](
      Multimodal.decodeWav(7L, "JUNK".getBytes("US-ASCII") ++ good.drop(4))) // bad magic
    assertThrows[IllegalArgumentException](
      Multimodal.decodeWav(7L, good.dropRight(3)))                           // truncated data
    val riffSizeLied = good.clone(); riffSizeLied(4) = (riffSizeLied(4) + 1).toByte
    assertThrows[IllegalArgumentException](Multimodal.decodeWav(7L, riffSizeLied))
    // 8-bit PCM is unsupported: flip the bits-per-sample field in fmt
    val eightBit = good.clone()
    val fmtOff = 12 + 8 + 14 // RIFF(12) + "fmt "+size(8) + offset of bits field
    eightBit(fmtOff) = 8; eightBit(fmtOff + 1) = 0
    assertThrows[IllegalArgumentException](Multimodal.decodeWav(7L, eightBit))
    // a chunk size with the high bit set is UNSIGNED-huge, not negative:
    // it must fail the overrun check, never walk the cursor backwards
    // into an infinite loop (the fmt chunk is the first after "WAVE")
    val negSize = good.clone()
    negSize(12 + 7) = 0x80.toByte // fmt size 16 -> 0x80000010
    assertThrows[IllegalArgumentException](Multimodal.decodeWav(7L, negSize))
  }

  test("wavFeatures roundtrip: zero-crossings + peaks match the planted formula exactly") {
    for (id <- Seq(0L, 5L, 96L, 200L)) {
      val f = Multimodal.wavFeatures(id, Multimodal.encodeWav(id))
      val n = 64 + (id % 97).toInt
      assert(f.n_samples == n)
      def feats(ch: Int): (Int, Int) = {
        val vs = (0 until n).map(t => Multimodal.wavSample(id, ch, t))
        (vs.sliding(2).count(p => p(0).toLong * p(1) < 0), vs.map(math.abs).max)
      }
      val (z0, p0) = feats(0); val (z1, p1) = feats(1)
      assert(f.zcr_ch0 == z0 && f.zcr_ch1 == z1, s"zcr drifted for id $id: $f")
      assert(f.peak_ch0 == p0 && f.peak_ch1 == p1, s"peak drifted for id $id: $f")
    }
  }

  test("wavFeatures hand-check: sign changes counted strictly, zeros don't cross") {
    // ch0 = [-1, 300, 0, -5]: one strict crossing (-1→300); 300→0 and
    // 0→-5 have product 0, NOT < 0. ch1 = [2, -300, 4, -4]: three.
    def le16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = "fmt ".getBytes("US-ASCII").toSeq ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)
    val frames = Seq((-1, 2), (300, -300), (0, 4), (-5, -4))
    val data = "data".getBytes("US-ASCII").toSeq ++ le32(16) ++
      frames.flatMap { case (a, b) => le16(a & 0xffff) ++ le16(b & 0xffff) }
    val body = "WAVE".getBytes("US-ASCII").toSeq ++ fmt ++ data
    val wav = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(body.size) ++ body).toArray
    val f = Multimodal.wavFeatures(1L, wav)
    assert(f.n_samples == 4 && f.zcr_ch0 == 1 && f.zcr_ch1 == 3, s"$f")
    assert(f.peak_ch0 == 300 && f.peak_ch1 == 300, s"$f")
    // malformed input fails loudly through the same shared RIFF walk
    assertThrows[IllegalArgumentException](Multimodal.wavFeatures(1L, wav.dropRight(3)))
  }

  test("decodeWav rejects an empty data chunk instead of emitting NaN means") {
    def le16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = "fmt ".getBytes("US-ASCII").toSeq ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)
    val data = "data".getBytes("US-ASCII").toSeq ++ le32(0)
    val body = "WAVE".getBytes("US-ASCII").toSeq ++ fmt ++ data
    val wav = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(body.size) ++ body).toArray
    assertThrows[IllegalArgumentException](Multimodal.decodeWav(1L, wav))
  }

  test("resampleWavNearest picks NN frames: 4 frames resampled to 2 reads frames 0 and 2") {
    def le16(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = "fmt ".getBytes("US-ASCII").toSeq ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16)
    // ch0 = [100, -200, 300, -400], ch1 = [5, 6, 7, 8]
    val frames = Seq((100, 5), (-200, 6), (300, 7), (-400, 8))
    val data = "data".getBytes("US-ASCII").toSeq ++ le32(4 * 4) ++
      frames.flatMap { case (a, b) => le16(a & 0xffff) ++ le16(b & 0xffff) }
    val body = "WAVE".getBytes("US-ASCII").toSeq ++ fmt ++ data
    val wav = ("RIFF".getBytes("US-ASCII").toSeq ++ le32(body.size) ++ body).toArray
    // nOut=2 → t = (j·4)/2 = 0, 2: frames 1 and 3 are skipped entirely
    val r = Multimodal.resampleWavNearest(1L, wav, 2)
    assert(r.n_samples == 4 && r.n_out == 2, s"$r")
    assert(r.mean_ch0 == 200.0 && r.peak_ch0 == 300, s"$r")
    assert(r.mean_ch1 == 6.0 && r.peak_ch1 == 7, s"$r")
    assertThrows[IllegalArgumentException](Multimodal.resampleWavNearest(1L, wav, 0))
  }

  // gray-valued P6: every channel of pixel s carries v(s), so the
  // aHash grayscale (r+g+b)/3 is v(s) exactly
  private def grayPpm(w: Int, h: Int, v: Int => Int): Array[Byte] =
    ppm(s"P6\n$w $h\n255\n",
      Array.tabulate(w * h * 3)(k => v(k / 3).toByte))

  test("phashAHash is brightness-invariant: a +30 shifted copy hashes identically") {
    // cells and mean shift together (mean = (sum + 64·30)/64 = mean + 30
    // exactly), so every gray>mean comparison — and the hash — is
    // unchanged while the BYTES all differ: the perceptual point
    val base = grayPpm(8, 8, s => (s * 3) % 200)
    val shifted = grayPpm(8, 8, s => (s * 3) % 200 + 30)
    assert(!java.util.Arrays.equals(base, shifted))
    val hb = Multimodal.phashAHash(1L, base)
    val hs = Multimodal.phashAHash(2L, shifted)
    assert((hb.phash_hi, hb.phash_lo) == (hs.phash_hi, hs.phash_lo))
  }

  test("phashAHash is NN-scale-invariant: a 2x-upscaled copy hashes identically") {
    // 16×16 image whose (x, y) pixel copies the 8×8 base's (x/2, y/2):
    // the 8×8 sampling grid picks (2x, 2y) = exactly the base pixels
    val v = (s: Int) => (s * 7) % 256
    val base = grayPpm(8, 8, v)
    val up = grayPpm(16, 16, s => v((s / 16 / 2) * 8 + (s % 16) / 2))
    val hb = Multimodal.phashAHash(1L, base)
    val hu = Multimodal.phashAHash(2L, up)
    assert((hb.phash_hi, hb.phash_lo) == (hu.phash_hi, hu.phash_lo))
  }

  test("phashAHash separates structure: flat is all-zero, checkerboard sets exactly half the bits") {
    val flat = Multimodal.phashAHash(1L, grayPpm(8, 8, _ => 100))
    assert(flat.phash_hi == 0L && flat.phash_lo == 0L) // gray > mean never true
    val checker = Multimodal.phashAHash(2L,
      grayPpm(8, 8, s => if ((s / 8 + s % 8) % 2 == 0) 255 else 0))
    assert(java.lang.Long.bitCount(checker.phash_hi) +
      java.lang.Long.bitCount(checker.phash_lo) == 32)
    assert((checker.phash_hi, checker.phash_lo) != (flat.phash_hi, flat.phash_lo))
  }
}
