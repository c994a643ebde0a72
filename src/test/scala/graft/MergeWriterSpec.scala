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

  test("MergeResult classifies the batch: inserted/updated/unchangedHits observed on the write") {
    val dir = tmp()
    MergeWriter.merge(spark, dir,
      df(Seq(("e1", 10L, "a"), ("e2", 10L, "b"), ("e3", 10L, "c"))),
      Seq("event_id"), Seq("timestamp"))
    // SCD-1 merge: e1 changed, e2 identical (hit), e4 fresh
    val r = MergeWriter.merge(spark, dir,
      df(Seq(("e1", 20L, "a2"), ("e2", 20L, "b"), ("e4", 20L, "d"))),
      Seq("event_id"), Seq("timestamp"), changeCols = Some(Seq("content")))
    assert((r.inserted, r.updated, r.unchangedHits) == ((1L, 1L, 1L)),
      s"got $r")
    assert(r.rows == 4, "written segment = full merged content (e1..e4)")
    // LWW merge (changeCols=None): every matched key counts as updated
    val r2 = MergeWriter.merge(spark, dir,
      df(Seq(("e2", 30L, "b"), ("e5", 30L, "e"))),
      Seq("event_id"), Seq("timestamp"))
    assert((r2.inserted, r2.updated, r2.unchangedHits) == ((1L, 1L, 0L)),
      s"LWW has no no-op path, got $r2")
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

  test("property: random interleavings of merge/compact/vacuum/rebucket preserve the LWW model") {
    // the per-op laws above test each mechanism against its neighbor;
    // this drives random SEQUENCES of them against one in-memory model,
    // the shape a long-lived table actually sees (continuous merges with
    // maintenance and an occasional layout migration mixed in). Any
    // manifest bug that needs a specific op ORDER to trigger — a
    // compact folding a segment vacuum was about to need, a rebucket
    // racing stale stats — shows up as a model divergence here.
    import scala.util.Random
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val dir = tmp()
      var spec = MergeWriter.BucketSpec("event_id", 8, Seq("timestamp"))
      val model = scala.collection.mutable.Map[String, (Long, String)]()
      var ts = 0L
      def mergeBatch(): Unit = {
        val rows = (1 to 1 + rnd.nextInt(12)).map { _ =>
          ts += 1; (s"k${1 + rnd.nextInt(15)}", ts, s"c$ts")
        }
        // model: within-batch LWW by timestamp, then batch wins over
        // the snapshot (the reference's latest-statement semantics)
        rows.groupBy(_._1).foreach { case (k, rs) =>
          val w = rs.maxBy(_._2); model(k) = (w._2, w._3)
        }
        MergeWriter.merge(spark, dir, df(rows),
          Seq("event_id"), Seq("timestamp"), bucket = Some(spec))
      }
      mergeBatch() // establish the bucketed layout
      for (step <- 1 to 9) {
        rnd.nextInt(5) match {
          case 0 | 1 => mergeBatch()
          case 2 => MergeWriter.compact(spark, dir, df(Nil).schema, spec)
          case 3 => MergeWriter.vacuum(dir, keepVersions = 1 + rnd.nextInt(2))
          case 4 =>
            val nb = Seq(4, 8, 16)(rnd.nextInt(3))
            if (nb != spec.buckets) {
              spec = MergeWriter.BucketSpec("event_id", nb, Seq("timestamp"))
              MergeWriter.rebucket(spark, dir, df(Nil).schema, spec)
            }
        }
        assert(snap(dir) == model.toMap, s"seed=$seed step=$step: snapshot diverged from model")
      }
      // pruned point reads agree under whatever layout the walk ended on
      model.keys.take(5).foreach { k =>
        val got = MergeWriter.readBuckets(spark, dir, df(Nil).schema,
            Set(MergeWriter.bucketIdOf(k, spec.buckets)))
          .filter(col("event_id") === k).collect()
          .map(r => (r.getLong(1), r.getString(2))).toSeq
        assert(got == Seq(model(k)), s"seed=$seed: pruned read of $k diverged")
      }
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

  test("buckets >> parallelism: capped write tasks still yield one file per non-empty bucket") {
    // writeSegment caps write partitions at 4× parallelism (several
    // buckets share a task), so the invariant the manifest/pruning
    // layer rests on — every bucket is exactly one leaf dir holding
    // exactly one file per segment — must come from hash-partitioning
    // on the bucket id + partitionBy, not from one-task-per-bucket
    val dir = tmp()
    val wide = MergeWriter.BucketSpec("event_id", 1000, Seq("timestamp"))
    val seed = (1 to 200).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"),
      bucket = Some(wide))
    val entries = MergeWriter.manifestFull(dir)
    val expected = seed.map(r => MergeWriter.bucketIdOf(r._1, 1000)).toSet
    assert(entries.map(_.bucket).toSet == expected,
      "one manifest entry per non-empty bucket, none for empty buckets")
    entries.foreach { e =>
      val files = Files.list(java.nio.file.Paths.get(dir, e.path)).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      assert(files.length == 1, s"bucket ${e.bucket} must hold ONE file, got ${files.length}")
    }
    assert(snap(dir).size == 200, "round-trip intact under the capped layout")
    // point read still prunes with the wide modulus
    val hit = MergeWriter.readBuckets(spark, dir, df(Nil).schema,
      Set(MergeWriter.bucketIdOf("k7", 1000)))
      .filter(col("event_id") === "k7").collect()
    assert(hit.map(_.getString(0)).toSeq == Seq("k7"))
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

  test("merge reads ONLY touched-bucket files and row-counts without a snapshot re-scan") {
    val dir = tmp()
    val seed = (1 to 40).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"), bucket = bucket)
    val touchedBucket = MergeWriter.bucketIdOf("k1", 8)
    val untouchedPaths = MergeWriter.manifestEntries(dir)
      .collect { case (b, p) if b != touchedBucket => p }.toSet
    assert(untouchedPaths.nonEmpty)
    MergeWriter.readLog.clear()
    val res = MergeWriter.merge(spark, dir, df(Seq(("k1", 2L, "v1b"))),
      Seq("event_id"), Seq("timestamp"), bucket = bucket)
    import scala.jdk.CollectionConverters._
    val readRels = MergeWriter.readLog.asScala.toSeq
      .filter(_._1 == dir).flatMap(_._2).toSet
    assert(readRels.intersect(untouchedPaths).isEmpty,
      s"merge must not read untouched buckets, read: $readRels")
    // rows = the merged segment's rows (every seed key sharing k1's
    // bucket, with k1 replaced in place), observed on the write itself
    val expected = seed.count { case (k, _, _) => MergeWriter.bucketIdOf(k, 8) == touchedBucket }
    assert(res.rows == expected, s"expected segment rows $expected, got ${res.rows}")
  }

  test("empty-batch merge is a safe no-op commit (zero write tasks, rows=0)") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("k1", 1L, "a"))),
      Seq("event_id"), Seq("timestamp"), bucket = bucket)
    val res = MergeWriter.merge(spark, dir, df(Nil),
      Seq("event_id"), Seq("timestamp"), bucket = bucket)
    assert(res.rows == 0, "no observed tasks must read as zero rows")
    assert(snap(dir) == Map("k1" -> ((1L, "a"))), "snapshot unchanged")
  }

  test("two concurrent writers both commit via claim retry; result equals sequential") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e0", 1L, "seed"))), Seq("event_id"), Seq("timestamp"))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fa = Future(MergeWriter.merge(spark, dir, df(Seq(("ea", 2L, "a"))),
        Seq("event_id"), Seq("timestamp")))
      val fb = Future(MergeWriter.merge(spark, dir, df(Seq(("eb", 3L, "b"))),
        Seq("event_id"), Seq("timestamp")))
      Await.result(fa, 120.seconds)
      Await.result(fb, 120.seconds)
    } finally pool.shutdown()
    assert(snap(dir).keySet == Set("e0", "ea", "eb"),
      "both writers' rows must land (no lost update, no crash)")
    assert(MergeWriter.currentVersion(dir).contains(2L), "two distinct commits")
  }

  test("compact folds append stacks to one segment per bucket; vacuum enforces retention") {
    val dir = tmp()
    val seed = (1 to 20).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"), bucket = bucket) // v0
    MergeWriter.appendSegment(spark, dir, df(Seq(("a1", 2L, "x"))), bucket) // v1
    MergeWriter.appendSegment(spark, dir, df(Seq(("a1", 3L, "y"))), bucket) // v2 — same bucket as v1's a1
    val fragBefore = MergeWriter.manifestEntries(dir).groupBy(_._1).filter(_._2.size > 1)
    assert(fragBefore.nonEmpty, "appends must have fragmented at least one bucket")
    val vC = MergeWriter.compact(spark, dir, df(Nil).schema, bucket.get) // v3
    assert(vC == 3L)
    val after = MergeWriter.manifestEntries(dir)
    assert(after.groupBy(_._1).forall(_._2.size == 1), "every bucket one segment after compact")
    assert(MergeWriter.readSnapshot(spark, dir, df(Nil).schema).count() == 22)
    // compact carried non-fragmented buckets by path (no rewrite)
    val beforePaths = MergeWriter.manifestEntriesAt(dir, 2).toMap
    after.foreach { case (b, p) =>
      if (!fragBefore.contains(b)) assert(beforePaths.get(b).contains(p), s"bucket $b must carry")
    }

    // retention: keep only the current version; older versions + their
    // now-unreferenced segments are deleted, current stays readable
    val stats = MergeWriter.vacuum(dir, keepVersions = 1)
    assert(stats.droppedVersions == 3, s"v0..v2 dropped, got $stats")
    assert(stats.droppedSegments > 0, "fragmented/append segments must be GC'd")
    assert(MergeWriter.readSnapshot(spark, dir, df(Nil).schema).count() == 22)
    assert(MergeWriter.readVersion(spark, dir, df(Nil).schema, 3).count() == 22)
    intercept[NoSuchElementException] {
      MergeWriter.readVersion(spark, dir, df(Nil).schema, 1)
    }
    // nothing unreferenced remains under seg/
    val referenced = MergeWriter.manifestEntriesAt(dir, 3).map(_._2).toSet
    import scala.jdk.CollectionConverters._
    val segRoot = java.nio.file.Paths.get(dir, "seg")
    val leaves = Files.list(segRoot).iterator().asScala.toSeq.flatMap { segDir =>
      val buckets = Files.list(segDir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("__bucket="))
      if (buckets.isEmpty) Seq(s"seg/${segDir.getFileName}")
      else buckets.map(b => s"seg/${segDir.getFileName}/${b.getFileName}")
    }
    leaves.foreach(l => assert(referenced.contains(l), s"unreferenced survivor: $l"))
    // idempotent: a second vacuum is a no-op
    assert(MergeWriter.vacuum(dir, keepVersions = 1) == MergeWriter.VacuumStats(0, 0))
  }

  test("vacuum never deletes a legacy version dir still referenced as a segment") {
    val dir = tmp()
    // round-1 legacy layout: parquet directly in v0/, no _MANIFEST
    df(Seq(("e1", 1L, "legacy"))).write.parquet(s"$dir/v0")
    Files.write(java.nio.file.Paths.get(dir, "_CURRENT"), "0".getBytes)
    // appends carry the legacy segment forward by reference
    MergeWriter.appendSegment(spark, dir, df(Seq(("e2", 2L, "b")))) // v1
    MergeWriter.appendSegment(spark, dir, df(Seq(("e3", 3L, "c")))) // v2
    val stats = MergeWriter.vacuum(dir, keepVersions = 1)
    assert(stats.droppedVersions == 1, s"only v1 drops (v0 is a referenced segment): $stats")
    assert(snap(dir).keySet == Set("e1", "e2", "e3"))
  }

  test("publish re-plans against the advanced snapshot after a claim conflict (no lost update)") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e1", 1L, "a"), ("e2", 2L, "b"))),
      Seq("event_id"), Seq("timestamp"))
    var calls = 0
    MergeWriter.publish(spark, dir, base => {
      calls += 1
      // a racer commits BETWEEN this writer's planning and its claim —
      // exactly the window where the old df-taking publish would retry
      // and commit the stale full rewrite, dropping the racer's row
      if (calls == 1)
        MergeWriter.appendSegment(spark, dir, df(Seq(("race", 9L, "r"))))
      MergeWriter.readVersion(spark, dir, df(Nil).schema, base.get)
        .filter(col("event_id") =!= "e2") // the transform: delete e2
    })
    assert(calls == 2, "claim conflict must re-run the planner")
    assert(snap(dir).keySet == Set("e1", "race"),
      "racer's committed row must survive the retried full rewrite")
  }

  test("vacuum never deletes an in-flight writer's segment (version above current)") {
    val dir = tmp()
    MergeWriter.merge(spark, dir, df(Seq(("e1", 1L, "a"))), Seq("event_id"), Seq("timestamp")) // v0
    MergeWriter.merge(spark, dir, df(Seq(("e1", 2L, "b"))), Seq("event_id"), Seq("timestamp")) // v1
    // simulate a live writer mid-commit: v2 claimed, segment mid-write,
    // manifest not yet committed — the segment is unreferenced by every
    // retained manifest, yet must not be GC'd out from under the writer
    Files.createDirectory(java.nio.file.Paths.get(dir, "v2"))
    df(Seq(("e9", 9L, "inflight"))).write.parquet(s"$dir/seg/v2-merge")
    val stats = MergeWriter.vacuum(dir, keepVersions = 1)
    assert(Files.exists(java.nio.file.Paths.get(dir, "seg/v2-merge")),
      "in-flight segment (version > current) must survive vacuum")
    assert(Files.exists(java.nio.file.Paths.get(dir, "v2")),
      "live claim dir must survive vacuum (grace window)")
    assert(stats.droppedVersions == 1, s"superseded v0 still GC'd: $stats")
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

  test("bucket layout is persisted with the data; a writer with a different count fails loudly") {
    val dir = tmp()
    val seed = (1 to 20).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"), bucket = bucket)
    assert(MergeWriter.readBucketLayout(dir).contains(("event_id", 8)))
    // the modulus is a property of the DATA: a writer or reader opened
    // with a different count must fail, not prune with the wrong modulus
    val wrong = Some(MergeWriter.BucketSpec("event_id", 4))
    intercept[IllegalArgumentException] {
      MergeWriter.merge(spark, dir, df(Seq(("k1", 2L, "x"))),
        Seq("event_id"), Seq("timestamp"), bucket = wrong)
    }
    intercept[IllegalArgumentException] {
      MergeWriter.appendSegment(spark, dir, df(Seq(("a1", 2L, "x"))), wrong)
    }
    intercept[IllegalArgumentException] {
      MergeWriter.compact(spark, dir, df(Nil).schema, wrong.get)
    }
    // same count, evolved sortBy: allowed (within-bucket order only)
    MergeWriter.merge(spark, dir, df(Seq(("k1", 2L, "x"))),
      Seq("event_id"), Seq("timestamp"),
      bucket = Some(MergeWriter.BucketSpec("event_id", 8, Seq("timestamp", "content"))))
    assert(snap(dir)("k1") == ((2L, "x")))
  }

  test("rebucket migrates the layout; point reads prune with the new modulus") {
    val dir = tmp()
    val seed = (1 to 40).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"), bucket = bucket)
    val newSpec = MergeWriter.BucketSpec("event_id", 4, Seq("timestamp"))
    MergeWriter.rebucket(spark, dir, df(Nil).schema, newSpec)
    assert(MergeWriter.readBucketLayout(dir).contains(("event_id", 4)))
    val entries = MergeWriter.manifestEntries(dir)
    assert(entries.map(_._1).forall(b => b >= 0 && b < 4), s"all ids under the new modulus: $entries")
    assert(snap(dir).size == 40, "migration preserves every row")
    // point read under the new modulus finds its key in a file subset
    val b = MergeWriter.bucketIdOf("k7", 4)
    val pruned = MergeWriter.readBuckets(spark, dir, df(Nil).schema, Set(b))
      .filter(col("event_id") === "k7").collect()
    assert(pruned.map(_.getString(0)).toSeq == Seq("k7"))
    // the old spec now fails loudly; the new spec merges fine
    intercept[IllegalArgumentException] {
      MergeWriter.merge(spark, dir, df(Seq(("k1", 2L, "x"))),
        Seq("event_id"), Seq("timestamp"), bucket = bucket)
    }
    MergeWriter.merge(spark, dir, df(Seq(("k1", 2L, "x"))),
      Seq("event_id"), Seq("timestamp"), bucket = Some(newSpec))
    assert(snap(dir)("k1") == ((2L, "x")))
  }

  test("compactAppends: below threshold is a no-op; at threshold folds the tail, base carried by path") {
    val dir = tmp()
    // large base segment: distinct contents so parquet can't collapse it
    // below the tail's size via dictionary/RLE
    val baseRows = (1 to 1000).map(i => (s"k$i", i.toLong, s"content-$i-" * 8))
    MergeWriter.appendSegment(spark, dir, df(baseRows)) // v0
    MergeWriter.appendSegment(spark, dir, df(Seq(("a1", 1L, "t")))) // v1
    MergeWriter.appendSegment(spark, dir, df(Seq(("a2", 2L, "t")))) // v2
    // tail.size = 2 < minSegments and tail bytes << base bytes -> no-op
    val vNoop = MergeWriter.compactAppends(spark, dir, df(Nil).schema, minSegments = 3)
    assert(vNoop == 2L, "below both thresholds must not commit")
    assert(MergeWriter.manifestEntries(dir).size == 3, "manifest untouched by the no-op")
    // third small append crosses the count threshold -> fold ONLY the tail
    MergeWriter.appendSegment(spark, dir, df(Seq(("a3", 3L, "t")))) // v3
    val baseFiles = listDataFiles(s"$dir/seg/v0-append")
    val vFold = MergeWriter.compactAppends(spark, dir, df(Nil).schema, minSegments = 3)
    assert(vFold == 4L)
    val after = MergeWriter.manifestEntries(dir)
    assert(after.size == 2, s"base + folded tail, got $after")
    assert(after.contains((-1, "seg/v0-append")), "base segment must be carried by path")
    // the base tier's files are byte-identical (never read or rewritten)
    listDataFiles(s"$dir/seg/v0-append").foreach { case (p, sig) =>
      assert(baseFiles.get(p).contains(sig), s"$p must be untouched by the tail fold")
    }
    assert(MergeWriter.readSnapshot(spark, dir, df(Nil).schema).count() == 1003)
  }

  test("compactAppends: re-absorbs the base once the tail outgrows it (fold to one segment)") {
    val dir = tmp()
    // four equal-size appends: tail bytes (3x) >= largest (1x) -> fold all
    (1 to 4).foreach(i =>
      MergeWriter.appendSegment(spark, dir, df(Seq((s"e$i", i.toLong, "v")))))
    val v = MergeWriter.compactAppends(spark, dir, df(Nil).schema, minSegments = 16)
    assert(v == 4L, "byte-ratio trigger must fire even below the count threshold")
    assert(MergeWriter.manifestEntries(dir) == Seq((-1, "seg/v4-compact")))
    assert(MergeWriter.readSnapshot(spark, dir, df(Nil).schema).count() == 4)
  }

  test("compactAppends rejects bucketed tables loudly (would de-bucket the layout)") {
    val dir = tmp()
    val seed = (1 to 20).map(i => (s"k$i", 1L, s"v$i"))
    MergeWriter.merge(spark, dir, df(seed), Seq("event_id"), Seq("timestamp"), bucket = bucket)
    MergeWriter.appendSegment(spark, dir, df(Seq(("a1", 2L, "x"))), bucket)
    intercept[IllegalArgumentException] {
      MergeWriter.compactAppends(spark, dir, df(Nil).schema)
    }
  }

  /** parquet data files under dir -> (size, mtime) signature */
  private def listDataFiles(dir: String): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(java.nio.file.Paths.get(dir)))(
      _.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p.toString ->
          ((Files.size(p), Files.getLastModifiedTime(p).toMillis)))
        .toMap)
  }
}
