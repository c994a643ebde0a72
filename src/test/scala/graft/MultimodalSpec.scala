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
