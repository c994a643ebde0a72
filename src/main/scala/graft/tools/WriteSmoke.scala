package graft.tools

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Bench
import graft.etl.{Catalog, MergeWriter}

/** ×K decade smoke for the WRITE path (round-16 verdict #2): the ingest
  * hot path — `Catalog.upsert` → `MergeWriter.merge` (L1 LWW upsert ≙
  * the reference's per-event ON CONFLICT upsert, db.utils.ts:30-66) and
  * compaction — measured against pre-grown snapshots at ×1/×10/×100,
  * the same way the round-15 decade smoke measured the dedup/sim reads.
  *
  * Extracted-code discipline: every timed operation IS the production
  * call (`Catalog.upsert`, `Catalog.append`, `Catalog.compact` — the
  * exact calls `Pipeline.applyBatch` and the maintenance cadence make),
  * and the batch-outcome counters (inserted/updated/unchanged hits)
  * come from `MergeResult`, observed on the merge's own write — not
  * from a parallel recount.
  *
  * Corpus: the sf0.1 `events` table re-expressed in the messages-table
  * shape (the L1 target), ×K by re-keyed copies — event ids AND room
  * ids are disjoint per copy, so the ×K corpus has K× the rooms at
  * constant per-room mass (the realistic 100 TB shape: growth adds
  * rooms/users, hot-room history is bounded per room). The measured
  * batch is K-INVARIANT: the same ~6.4k-row mixed batch (half changed
  * updates, a quarter identical rows, a quarter fresh inserts, confined
  * to 64 copy-0 rooms) lands on every decade, so wall/rewrite growth
  * isolates snapshot size, not batch size.
  *
  * Two bucket layouts per decade — the same honest/deployment split the
  * round-15 LSH smoke used for its planes knob:
  *  - FIXED 16 buckets (the local-test default): 64 rooms hash over all
  *    16 buckets, so the merge rewrites ~the whole snapshot and cost
  *    grows ~K — the honest record that a fixed bucket count does not
  *    scale, exactly like fixed LSH planes.
  *  - GROWN 16·K buckets (bucket count sized with the data — SURVEY
  *    §2.4 "thousands at cluster scale"): the 64 touched rooms land in
  *    ≤64 of 16·K buckets, per-bucket mass is ~constant, so rewrite
  *    mass and wall stay ~flat across decades — the shape a 1000-
  *    executor cluster runs.
  *
  * Usage: sbt "runMain graft.tools.WriteSmoke"
  */
object WriteSmoke {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val keys = Seq("event_id")
    val orderBy = Seq("timestamp", "id") // the Pipeline's exact L1 config

    /** events → messages-table shape for copy `i` (disjoint event AND
      * room keys per copy; 1000 rooms per copy). The fixed processed_at
      * keeps reruns byte-deterministic. */
    def msgShape(ev: DataFrame, i: Int): DataFrame =
      ev.select(
        concat(lit("$e"), col("event_id") + lit(i * 10000000L), lit(":x")).as("event_id"),
        concat(lit("!r"), pmod(col("event_id"), lit(1000L)) + lit(i * 1000L), lit(":x")).as("room_id"),
        concat(lit("@u"), col("user_id"), lit(":x")).as("sender"),
        col("props").as("content"),
        col("event_type"),
        unix_millis(col("ts")).as("timestamp"),
        lit(false).as("is_encrypted"),
        lit(null).cast("string").as("relates_to"),
        lit(null).cast("string").as("error"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("processed_at"))
        .withColumn("id", md5(col("event_id")))
        .select("id", "event_id", "room_id", "sender", "content", "event_type",
          "timestamp", "is_encrypted", "relates_to", "error", "processed_at")

    // ts normalized at the reader boundary (identity on current
    // timestamp[us] testdata; truncating div on a legacy nanos-as-Long
    // generation) so the unix_millis(ts) in the shape fns is always
    // analyzable — the back-compat the session's nanosAsLong opts into.
    def events: DataFrame = graft.Tables.eventsNorm(spark, sf)

    def corpus(k: Int): DataFrame =
      (0 until k).map(msgShape(events, _)).reduce(_ unionByName _)

    /** K-invariant mixed batch over 64 copy-0 rooms (event_id%1000<64):
      * %4∈{0,1} → changed update (newer ts, new content); %4==2 → the
      * row verbatim (the SCD-1 no-op shape); %4==3 → a fresh insert
      * into the same room. ~6.4k rows total at sf0.1. */
    def batch: DataFrame = {
      val base = events.filter(pmod(col("event_id"), lit(1000L)) < 64)
      val m = pmod(col("event_id"), lit(4L))
      val changed = msgShape(base.filter(m.isin(0L, 1L)), 0)
        .withColumn("content", concat(lit("upd:"), coalesce(col("content"), lit(""))))
        .withColumn("timestamp", col("timestamp") + lit(1000L))
        .withColumn("id", md5(col("event_id")))
      val identical = msgShape(base.filter(m === 2L), 0)
      // insert offset far above every copy's id range (max copy id ≈
      // 99·10⁷ + 10⁵): a colliding id would silently turn the insert
      // quarter into updates at large K — and, worse for the smoke's
      // validity, into rows whose room (bucket col) differs from the
      // existing row's, violating the bucketed-merge contract that a
      // key never changes its bucket column (an event never changes
      // room). 2·10⁹ ≡ 0 (mod 1000) keeps the rooms in r0-r63.
      val inserts = msgShape(
        base.filter(m === 3L).withColumn("event_id", col("event_id") + lit(2000000000L)), 0)
      changed.unionByName(identical).unionByName(inserts)
    }

    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.isolate(spark)
      (sec, a)
    }

    /** Pristine snapshot cache (built once per (k, buckets) through the
      * real bulk-load path); measurements run on throwaway copies. */
    def pristine(k: Int, buckets: Int): String = {
      val dir = s"/tmp/graft-scale/write/v1/${Paths.get(sf).getFileName}/x$k-b$buckets"
      if (!Files.exists(Paths.get(s"$dir/messages"))
          || MergeWriter.currentVersion(s"$dir/messages").isEmpty) {
        val cat = Catalog(dir, messageBuckets = buckets)
        cat.bootstrap()
        val (sec, r) = timed(cat.upsert(spark, "messages", corpus(k), keys, orderBy))
        println(f"""{"write":"bulk_load","scale":$k,"buckets":$buckets,"sec":$sec%.2f,"rows":${r.rows}}""")
      }
      dir
    }

    def workCopy(k: Int, buckets: Int, tag: String): Catalog = {
      val src = pristine(k, buckets)
      val dst = s"/tmp/graft-scale/write/work/${Paths.get(sf).getFileName}/x$k-b$buckets-$tag"
      if (Files.exists(Paths.get(dst))) Seq("rm", "-rf", dst).!
      Files.createDirectories(Paths.get(dst).getParent)
      Seq("cp", "-r", src, dst).!
      Catalog(dst, messageBuckets = buckets)
    }

    val b = batch.cache()
    val batchRows = b.count()

    // JIT warm-up (untimed): the full measured flow at ×1/4-buckets
    {
      val cat = workCopy(1, 4, "warm")
      cat.upsert(spark, "messages", b, keys, orderBy)
      cat.upsert(spark, "messages", b, keys, orderBy,
        changeCols = Some(Seq("content", "error")))
      cat.append(spark, "messages", b)
      cat.compact(spark, "messages")
      Bench.isolate(spark)
    }

    for (k <- Seq(1, 10, 100); buckets <- Seq(16, 16 * k).distinct) {
      // touched buckets: the same bucketExpr the merge prunes with
      val touched = b.select(MergeWriter.bucketExpr(col("room_id"), buckets))
        .distinct().count()

      // L1 LWW merge of the mixed batch — min of 2 (each on a fresh
      // copy; minute-scale single reps swing, round-13 bench lesson)
      val (s1a, r1a) = { val c = workCopy(k, buckets, "m1a")
        timed(c.upsert(spark, "messages", b, keys, orderBy)) }
      val catM = workCopy(k, buckets, "m1b")
      val (s1b, r1) = timed(catM.upsert(spark, "messages", b, keys, orderBy))
      val s1 = math.min(s1a, s1b)
      assert((r1.inserted, r1.updated) == ((r1a.inserted, r1a.updated)))
      println(f"""{"write":"merge_lww","scale":$k,"buckets":$buckets,"min_of_2_sec":$s1%.2f,"seg_rows":${r1.rows},"inserted":${r1.inserted},"updated":${r1.updated},"hits":${r1.unchangedHits},"touched_buckets":$touched,"batch":$batchRows}""")

      // SCD-1 re-merge of the SAME batch on the post-merge snapshot:
      // change detection sees every row unchanged — hit rate 1.0 — but
      // the rewrite is still bucket-granular (immutable segments): the
      // honest record that detection preserves VALUES (created_at-style
      // carry), not write mass. ≙ db.utils.ts:186-194 IS DISTINCT FROM.
      val (s2, r2) = timed(catM.upsert(spark, "messages", b, keys, orderBy,
        changeCols = Some(Seq("content", "error"))))
      println(f"""{"write":"merge_scd1_allhit","scale":$k,"buckets":$buckets,"sec":$s2%.2f,"seg_rows":${r2.rows},"hits":${r2.unchangedHits},"hit_rate":${r2.unchangedHits.toDouble / batchRows}%.3f}""")

      // append stacking + compaction (the maintenance cadence):
      // 3 appends fragment the touched buckets, compact folds exactly
      // the fragmented ones (single-segment buckets carried by path)
      val (sApp, _) = timed { (1 to 3).foreach(_ => catM.append(spark, "messages", b)) }
      val frag = MergeWriter.manifestFull(catM.dir("messages"))
        .groupBy(_.bucket).count { case (bkt, es) => bkt >= 0 && es.size > 1 }
      val (sC, _) = timed(catM.compact(spark, "messages"))
      println(f"""{"write":"append_x3","scale":$k,"buckets":$buckets,"sec":$sApp%.2f}""")
      println(f"""{"write":"compact","scale":$k,"buckets":$buckets,"sec":$sC%.2f,"fragmented_buckets":$frag}""")
    }
    spark.stop()
  }
}
