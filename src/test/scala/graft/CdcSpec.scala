package graft

import graft.ext.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of content-defined chunking the DuckDB gate can't express:
  * the reassembly law (chunks partition the normalized text exactly)
  * and the LOCALITY law that is CDC's whole reason to exist — a
  * single-character edit re-syncs within one window, so chunks past
  * the edit keep their fingerprints (fixed-size chunking would shift
  * every subsequent chunk).
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, appName = "graft-test")
  val sf = "/root/testdata/sf0.001"

  /** The window hash of Cdc replicated independently (test-side twin). */
  private def cuts(norm: String): Seq[Int] = {
    val W = 16
    (W to norm.length - 1).filter { i =>
      val h = norm.substring(i - W, i).foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 2147483647)
      h % 64 == 0
    }
  }

  private def chunkRows(texts: Seq[String]) = {
    import spark.implicits._
    Cdc.chunkDf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
  }

  test("chunks partition every corpus document exactly (reassembly law)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .withColumn("norm", regexp_replace(lower(trim($"text")), "\\s+", " "))
      .filter(length($"norm") > 0)
    val perDoc = Cdc.chunkDf(Tables.documents(spark, sf))
      .groupBy($"doc_id")
      .agg(sum($"chunk_len").as("len_sum"), count(lit(1)).as("n"),
        min($"chunk_len").as("min_len"))
      .join(docs.select($"doc_id", length($"norm").as("len")), "doc_id")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getAs[Long]("len_sum") == r.getAs[Int]("len").toLong,
        s"doc ${r.get(0)}: chunk lengths don't sum to the text length")
      assert(r.getAs[Int]("min_len") > 0, s"doc ${r.get(0)}: empty chunk")
    }
  }

  test("short documents yield exactly one whole-text chunk") {
    val got = chunkRows(Seq("tiny text"))(0L)
    assert(got.size == 1 && got.head._3 == "tiny text".length)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("tiny text".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.head._4 == h, "single chunk must fingerprint the whole normalized text")
  }

  test("cut positions match the independent window-hash replica") {
    // deterministic pseudo-text with spaces so normalization is a no-op
    // already lowercase + single spaces, so normalization ≡ trim
    val norm = (0 until 600).map(i => ('a' + (i * 7 + i / 13) % 26).toChar)
      .grouped(9).map(_.mkString).mkString(" ").take(500).trim
    val got = chunkRows(Seq(norm))(0L)
    val expected = (Seq(0) ++ cuts(norm) ++ Seq(norm.length)).distinct.sorted
    assert(got.map(_._3).sum == norm.length)
    assert(got.size == expected.size - 1,
      s"chunk count ${got.size} != replica boundary count ${expected.size - 1}")
    val lens = expected.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(got.map(_._3) == lens, "chunk lengths must match the replica boundaries")
  }

  test("edit locality: a 1-char edit leaves all chunks past one window intact") {
    val tail = (0 until 800).map(i => ('a' + (i * 11 + i / 7) % 26).toChar)
      .grouped(7).map(_.mkString).mkString(" ")
    val a = "x" + tail
    val b = "y" + tail
    val rows = chunkRows(Seq(a, b))
    val (ca, cb) = (rows(0L), rows(1L))
    // identical window content from 1+W chars in ⇒ identical cuts there;
    // only chunks overlapping the first window may differ
    assert(ca.size >= 3, s"tail too short to exercise locality: ${ca.size} chunks")
    // the only boundary that may differ is a cut whose window overlaps
    // the edited char (i = 16), so the md5 SEQUENCES must share a
    // common suffix covering all but at most the first two chunks
    val (sa, sb) = (ca.map(_._4), cb.map(_._4))
    val suffix = (1 to math.min(sa.size, sb.size))
      .takeWhile(k => sa(sa.size - k) == sb(sb.size - k)).size
    assert(suffix >= ca.size - 2,
      s"edit broke ${ca.size - suffix} leading chunks; CDC must localize to the first window")
  }

  test("chunking is deterministic across runs") {
    def run() = chunkRows(Seq("determinism " * 40))
    assert(run() == run())
  }

  test("persisted chunk-store probe equals the in-plan recompute row for row") {
    // the same-oracle discipline made local: the committed-snapshot
    // read path and the in-plan store recompute must agree exactly
    // (both also gate against the shared DuckDB twin per round)
    def sorted(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(sorted("dedup_cdc_persisted") == sorted("dedup_cdc_incremental"))
  }
}
