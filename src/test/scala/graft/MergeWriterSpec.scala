package graft

import java.nio.file.Files
import graft.etl.MergeWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5 items 1-2: merge idempotency, LWW determinism,
  * change-detection (IS DISTINCT FROM), commutativity-by-key property. */
class MergeWriterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-merge")

  private def tmp(): String =
    Files.createTempDirectory("graft-merge").toString

  private def df(rows: Seq[(String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "timestamp", "content")
  }

  private def snap(dir: String): Map[String, (Long, String)] = {
    import spark.implicits._
    MergeWriter.readSnapshot(spark, dir, df(Nil).schema)
      .as[(String, Long, String)].collect()
      .map { case (k, ts, c) => k -> (ts, c) }.toMap
  }

  test("insert then upsert applies last-write-wins on the key") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e1", 10L, "a"), ("e2", 5L, "b"))),
      Seq("event_id"), Seq("timestamp"))
    // late duplicate with lower ts must lose; higher ts must win
    MergeWriter.merge(spark, dir, df(Seq(("e1", 3L, "stale"), ("e2", 9L, "fresh"))),
      Seq("event_id"), Seq("timestamp"))
    // NOTE batch-wins semantics: the reference's upsert takes the latest
    // *statement*, not the max timestamp — a replayed batch overwrites.
    assert(snap(dir) == Map("e1" -> (3L, "stale"), "e2" -> (9L, "fresh")))
  }

  test("applying the same batch twice equals applying it once (idempotent)") {
    val dir1 = tmp(); val dir2 = tmp()
    val batch = df(Seq(("e1", 10L, "a"), ("e2", 5L, "b"), ("e1", 12L, "a2")))
    MergeWriter.merge(spark, dir1, batch, Seq("event_id"), Seq("timestamp"))
    MergeWriter.merge(spark, dir2, batch, Seq("event_id"), Seq("timestamp"))
    MergeWriter.merge(spark, dir2, batch, Seq("event_id"), Seq("timestamp"))
    assert(snap(dir1) == snap(dir2))
    assert(snap(dir1)("e1") == ((12L, "a2"))) // in-batch LWW dedup
  }

  test("change detection keeps old row when tracked cols are identical") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e1", 10L, "same"))),
      Seq("event_id"), Seq("timestamp"), changeCols = Some(Seq("content")))
    val v1 = MergeWriter.currentVersion(dir).get
    // identical content, newer ts: change-detection suppresses the update
    MergeWriter.merge(spark, dir, df(Seq(("e1", 99L, "same"))),
      Seq("event_id"), Seq("timestamp"), changeCols = Some(Seq("content")))
    assert(snap(dir)("e1") == ((10L, "same")), "unchanged row must be kept")
    // changed content: update applies
    MergeWriter.merge(spark, dir, df(Seq(("e1", 100L, "new"))),
      Seq("event_id"), Seq("timestamp"), changeCols = Some(Seq("content")))
    assert(snap(dir)("e1") == ((100L, "new")))
    assert(MergeWriter.currentVersion(dir).get == v1 + 2)
  }

  test("null semantics: <=> treats null==null as no change") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e1", 1L, null))),
      Seq("event_id"), Seq("timestamp"), changeCols = Some(Seq("content")))
    MergeWriter.merge(spark, dir, df(Seq(("e1", 2L, null))),
      Seq("event_id"), Seq("timestamp"), changeCols = Some(Seq("content")))
    assert(snap(dir)("e1") == ((1L, null)), "null IS NOT DISTINCT FROM null")
    MergeWriter.merge(spark, dir, df(Seq(("e1", 3L, "x"))),
      Seq("event_id"), Seq("timestamp"), changeCols = Some(Seq("content")))
    assert(snap(dir)("e1") == ((3L, "x")), "null -> value IS DISTINCT")
  }

  test("property: merge(S,a);merge(S,b) == merge(S, LWW-dedup(a∪b)) for disjoint-time batches") {
    val keyGen = Gen.oneOf("k1", "k2", "k3", "k4")
    val rowGen = for {
      k <- keyGen; c <- Gen.alphaStr.map(_.take(5))
    } yield (k, c)
    val batchGen = Gen.listOfN(6, rowGen)
    (1 to 5).foreach { trial =>
      val a = batchGen.apply(Gen.Parameters.default, Seed(trial.toLong)).get
      val b = batchGen.apply(Gen.Parameters.default, Seed(trial.toLong + 100)).get
      // stamp strictly increasing timestamps across a then b, so
      // statement order and timestamp order coincide (the deterministic
      // LWW precondition — SURVEY §7.4 risk 2)
      val aTs = a.zipWithIndex.map { case ((k, c), i) => (k, i.toLong, c) }
      val bTs = b.zipWithIndex.map { case ((k, c), i) => (k, 100L + i, c) }
      val dirSeq = tmp(); val dirAll = tmp()
      MergeWriter.merge(spark, dirSeq, df(aTs), Seq("event_id"), Seq("timestamp"))
      MergeWriter.merge(spark, dirSeq, df(bTs), Seq("event_id"), Seq("timestamp"))
      MergeWriter.merge(spark, dirAll, df(aTs ++ bTs), Seq("event_id"), Seq("timestamp"))
      assert(snap(dirSeq) == snap(dirAll), s"trial $trial")
    }
  }

  test("versioned snapshots survive pointer swap (old version still readable)") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e1", 1L, "v0"))), Seq("event_id"), Seq("timestamp"))
    MergeWriter.merge(spark, dir, df(Seq(("e1", 2L, "v1"))), Seq("event_id"), Seq("timestamp"))
    // a reader holding v0 can still scan it after the swap
    assert(spark.read.parquet(s"$dir/v0").count() == 1)
    assert(snap(dir)("e1") == ((2L, "v1")))
  }
}
