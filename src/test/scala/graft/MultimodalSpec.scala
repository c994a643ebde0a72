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
  }

  test("resizePpmNearest: hand-checked NN mapping; pass-through box equals decode") {
    // 4×1 image, pixels P0..P3 with distinct channel values
    val px = (0 until 12).map(_.toByte).toArray // P0=(0,1,2) P1=(3,4,5) P2=(6,7,8) P3=(9,10,11)
    val img = ppm("P6\n4 1\n255\n", px)
    // box 2: rw = 4·2/4 = 2, rh = 1·2/4 = 0? — resizeStub: h·maxDim/m = 1·2/4 = 0…
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
}
