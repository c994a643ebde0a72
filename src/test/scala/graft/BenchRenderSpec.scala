package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fences Bench.renderLine's truncation-survival contract: the
  * driver's stdout capture keeps only the TAIL of the bench line, so
  * the queries map must be emitted cheap-first/heavy-last (heavy
  * entries survive truncation), errored entries must sort first AND be
  * named in the `errors` map at the very end of the line, and the
  * whole line must stay one line of valid JSON with exact values.
  * No SparkSession needed. */
class BenchRenderSpec extends AnyFunSuite {

  private val results = Seq(
    ("a_heavy", 2.5, None: Option[String]),
    ("b_cheap", 0.25, None: Option[String]),
    ("c_dead", -1.0, Some("boom \"quoted\"\npath\\x")),
    ("d_mid", 1.0, None: Option[String]))

  private val line = Bench.renderLine(results, Seq("d_mid" -> 2), 0.25, "/sf")

  test("queries are ordered cheap-first/heavy-last; errors sort first") {
    val idx = Seq("c_dead", "b_cheap", "d_mid", "a_heavy")
      .map(n => line.indexOf("\"" + n + "\":"))
    assert(idx.forall(_ >= 0), s"every query must appear: $line")
    assert(idx == idx.sorted,
      s"emission order must be by ascending seconds (errors first): $line")
    // the heavy entry must be the LAST key in the queries map — that is
    // the truncation-survival guarantee
    assert(line.contains("\"a_heavy\":2.5}"),
      s"heaviest query must close the queries map: $line")
  }

  test("single line of JSON: exact total, escaped errors after queries, flaky, calib") {
    // 2.5 + 0.25 + 1.0 is exact in binary floating point — the errored
    // query's -1 must NOT enter the total
    assert(line.startsWith("{\"metric\":\"total\",\"value\":3.75,"),
      s"total sums only successful reps: $line")
    assert(line.contains("\"calib_sec\":0.25"), line)
    assert(line.endsWith("\"sf\":\"/sf\"}"), line)
    // the error message had a quote, a backslash and a NEWLINE — all
    // must be escaped so the output stays ONE line
    assert(!line.contains("\n"), s"control chars must be escaped: $line")
    assert(line.contains("\"errors\":{\"c_dead\":\"boom \\\"quoted\\\""),
      s"quote-escaped error text: $line")
    assert(line.contains("path\\\\x\"}"), s"backslash-escaped error text: $line")
    // errors map comes AFTER the queries map so it survives tail
    // truncation even when the queries map is clipped
    assert(line.indexOf("\"errors\":{") > line.indexOf("\"a_heavy\":2.5}"),
      s"errors after queries: $line")
    assert(line.contains("\"flaky\":{\"d_mid\":2}"), line)
  }
}
