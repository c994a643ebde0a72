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
    // a reader holding v0 can still scan it after the swap (time travel)
    val v0 = MergeWriter.readVersion(spark, dir, df(Nil).schema, 0)
    assert(v0.count() == 1)
    assert(snap(dir)("e1") == ((2L, "v1")))
  }

  private val bucket = Some(MergeWriter.BucketSpec("event_id", 8, Seq("timestamp")))

  test("bucketed merge rewrites ONLY the touched buckets (O(batch), not O(snapshot))") {
    val dir = tmp()
    // seed: keys spread over several buckets
    val seed = (1 to 40).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"), bucket = bucket)
    val before = MergeWriter.manifestEntries(dir).toMap // bucketId -> path
    assert(before.size > 1, "seed must span multiple buckets")
    // incremental batch touching exactly one key (one bucket)
    val touchedBucket = MergeWriter.bucketIdOf("k1", 8)
    MergeWriter.merge(spark, dir, df(Seq(("k1", 2L, "v1b"))),
      Seq("event_id"), Seq("timestamp"), bucket = bucket)
    val after = MergeWriter.manifestEntries(dir).toMap
    // untouched buckets carry over their EXACT segment paths (no rewrite);
    // only the touched bucket points at a new segment
    before.foreach { case (b, path) =>
      if (b == touchedBucket) assert(after(b) != path, s"bucket $b must be rewritten")
      else assert(after(b) == path, s"bucket $b must be carried over untouched")
    }
    // semantics unchanged: the merged row won, everything else intact
    assert(snap(dir)("k1") == ((2L, "v1b")))
    assert(snap(dir).size == 40)
  }

  test("bucket-pruned read returns exactly the bucket's rows from a file subset") {
    val dir = tmp()
    val seed = (1 to 40).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"), bucket = bucket)
    val b = MergeWriter.bucketIdOf("k7", 8)
    val pruned = MergeWriter.readBuckets(spark, dir, df(Nil).schema, Set(b))
      .filter(col("event_id") === "k7").collect()
    assert(pruned.map(_.getString(0)).toSeq == Seq("k7"))
    // the pruned scan reads fewer manifest segments than the full scan
    val all = MergeWriter.manifestEntries(dir)
    val mine = all.filter { case (bid, _) => bid == -1 || bid == b }
    assert(mine.size < all.size)
  }

  test("second concurrent writer fails loudly instead of silently losing an update") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e1", 1L, "a"))), Seq("event_id"), Seq("timestamp"))
    // simulate a racing writer that already claimed v1
    Files.createDirectory(java.nio.file.Paths.get(dir, "v1"))
    intercept[java.util.ConcurrentModificationException] {
      MergeWriter.merge(spark, dir, df(Seq(("e2", 2L, "b"))), Seq("event_id"), Seq("timestamp"))
    }
  }

  test("appendSegment is O(batch): prior segment files are byte-identical after append") {
    val dir = tmp()
    MergeWriter.appendSegment(spark, dir, df(Seq(("e1", 1L, "a"))))
    val filesBefore = listDataFiles(dir)
    assert(filesBefore.nonEmpty)
    MergeWriter.appendSegment(spark, dir, df(Seq(("e2", 2L, "b"))))
    val filesAfter = listDataFiles(dir)
    // every pre-existing file still present with the same size+mtime
    filesBefore.foreach { case (p, sig) =>
      assert(filesAfter.get(p).contains(sig), s"$p must be untouched by append")
    }
    assert(filesAfter.size > filesBefore.size, "append must add new files")
    assert(snap(dir).keySet == Set("e1", "e2"))
  }

  /** parquet data files under dir -> (size, mtime) signature */
  private def listDataFiles(dir: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(p => p.toString ->
        ((Files.size(p), Files.getLastModifiedTime(p).toMillis)))
      .toMap
  }
}
