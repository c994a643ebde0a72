package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic upsert ("merge-on-write") over a versioned parquet snapshot —
  * the Spark re-expression of the reference's `ON CONFLICT … DO UPDATE`
  * family (src/server/utils/db.utils.ts:30-66, 68-104, 106-152, 282-290).
  *
  * Storage layout (manifest-based since round 2):
  * {{{
  * tableDir/
  *   _CURRENT              current version number (atomic pointer swap)
  *   v{n}/_MANIFEST        lines "bucketId<TAB>relativeSegmentPath"
  *   seg/v{n}-{tag}/       immutable parquet segments; bucketed segments
  *                         hold one __bucket=k/ leaf dir per bucket
  * }}}
  * A version is a MANIFEST over immutable segments, so:
  *  - `appendSegment` is O(batch): it writes ONLY the new rows and a new
  *    manifest that reuses every prior segment (the reference's plain
  *    INSERT, db.utils.ts:154-170, never rewrites the table either);
  *  - a bucketed `merge` rewrites ONLY the buckets the batch touches —
  *    untouched buckets' files are carried over by path. This is the
  *    cluster-scale analog of the reference's single-row upsert: write
  *    amplification is O(touched buckets), not O(snapshot);
  *  - round-1 layout (v{n}/ holding parquet directly) reads as a single
  *    unbucketed segment, and the first bucketed merge on top of it
  *    migrates the table to bucketed segments.
  *
  * Bucketing ≙ the reference's physical design: the `(room_id,
  * timestamp)` composite index + partial index (src/server/db/
  * schema.ts:81-87) become hash buckets on the key with rows sorted by
  * the sort columns inside each bucket (parquet min/max rowgroup
  * pruning takes the place of the B-tree's range order).
  *
  * Merge semantics (unchanged from round 1):
  *  - batch is first deduplicated per key, keeping the greatest
  *    `orderBy` tuple (deterministic last-write-wins; SURVEY §7.4 risk 2);
  *  - snapshot ⟗ batch on the key; batch side wins, except when
  *    `changeCols` is set and none of the tracked columns differ
  *    (`IS DISTINCT FROM` ⇄ negated `<=>` — the reference's SCD-1
  *    change-detection, db.utils.ts:82-86), in which case the existing
  *    row is kept untouched. NOTE: against the SNAPSHOT the batch wins
  *    unconditionally (statement semantics, like the reference's
  *    `ON CONFLICT DO UPDATE`); the orderBy LWW applies within a batch.
  *
  * Writer concurrency: `claimVersion` creates the v{n+1} directory with
  * an ATOMIC createDirectory — the second of two racing writers gets
  * FileAlreadyExistsException and fails loudly instead of silently
  * rewriting a committed snapshot (lost update). Crash recovery: a
  * claimed version dir without _MANIFEST is an orphan (pointer never
  * moved); delete it to let the next writer proceed.
  */
object MergeWriter {

  final case class MergeResult(version: Long, rows: Long)

  /** Hash-bucket layout spec: `col` is the bucketing key, `buckets` the
    * bucket count (thousands at cluster scale; small here), `sortBy`
    * orders rows within each bucket for rowgroup min/max pruning. */
  final case class BucketSpec(col: String, buckets: Int, sortBy: Seq[String] = Nil)

  /** Internal partition-directory column name for bucketed segments. */
  val BucketCol = "__bucket"

  private def pointer(tableDir: Path): Path = tableDir.resolve("_CURRENT")

  /** Bucket id of a key column — CRC32 of the UTF-8 bytes mod buckets.
    * CRC32 (not Spark's murmur3 `hash`) because it is bit-identical and
    * trivially computable on the driver (`bucketIdOf`), which is what
    * lets point reads prune to one bucket without running a job. */
  def bucketExpr(c: Column, buckets: Int): Column =
    coalesce(pmod(crc32(c.cast("binary")), lit(buckets.toLong)), lit(0L)).cast("int")

  /** Driver-side twin of [[bucketExpr]] for point-query pruning. */
  def bucketIdOf(key: String, buckets: Int): Int = {
    val crc = new java.util.zip.CRC32()
    crc.update(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (crc.getValue % buckets).toInt
  }

  /** Current snapshot version, or None before the first commit. */
  def currentVersion(tableDir: String): Option[Long] = {
    val p = pointer(Paths.get(tableDir))
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toLong)
    else None
  }

  /** Manifest of version `v`: (bucketId, segmentPath-relative-to-
    * tableDir). bucketId -1 = unbucketed segment (may hold any key).
    * A round-1 layout version (no _MANIFEST) is one unbucketed segment. */
  def manifestEntriesAt(tableDir: String, v: Long): Seq[(Int, String)] = {
    val mf = Paths.get(tableDir, s"v$v", "_MANIFEST")
    if (Files.exists(mf))
      Files.readAllLines(mf).asScala.toSeq.filter(_.nonEmpty).map { line =>
        val Array(b, p) = line.split("\t", 2)
        (b.toInt, p)
      }
    else Seq((-1, s"v$v"))
  }

  /** Manifest of the current version (empty before the first commit). */
  def manifestEntries(tableDir: String): Seq[(Int, String)] =
    currentVersion(tableDir) match {
      case None => Seq.empty
      case Some(v) => manifestEntriesAt(tableDir, v)
    }

  private def readPaths(spark: SparkSession, tableDir: String,
      schema: org.apache.spark.sql.types.StructType,
      rels: Seq[String]): DataFrame =
    if (rels.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(rels.map(r => s"$tableDir/$r"): _*)

  /** Read the current snapshot (empty frame with `schema` if absent). */
  def readSnapshot(spark: SparkSession, tableDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    readPaths(spark, tableDir, schema, manifestEntries(tableDir).map(_._2))

  /** Time-travel read of a committed version (segments are immutable, so
    * a reader holding version v is unaffected by later commits). */
  def readVersion(spark: SparkSession, tableDir: String,
      schema: org.apache.spark.sql.types.StructType, v: Long): DataFrame =
    readPaths(spark, tableDir, schema, manifestEntriesAt(tableDir, v).map(_._2))

  /** Bucket-pruned read: only segments that can contain the given bucket
    * ids (plus any unbucketed segments, which may contain anything).
    * This is the scan `Api.messagesPage` runs — one bucket's files, not
    * the table. */
  def readBuckets(spark: SparkSession, tableDir: String,
      schema: org.apache.spark.sql.types.StructType,
      bucketIds: Set[Int]): DataFrame = {
    val rels = manifestEntries(tableDir)
      .collect { case (b, p) if b == -1 || bucketIds.contains(b) => p }
    readPaths(spark, tableDir, schema, rels)
  }

  /** Atomically claim the next version directory — the writer lock.
    * Throws if another writer already claimed it (no silent lost
    * updates; see the concurrency note in the header). */
  private def claimVersion(tableDir: String): Long = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    val next = currentVersion(tableDir).getOrElse(-1L) + 1
    try { Files.createDirectory(dir.resolve(s"v$next")); next }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"version v$next of $tableDir already claimed by another writer " +
            "(or orphaned by a crash — delete the manifest-less dir to recover)")
    }
  }

  /** Write `df` as one immutable segment for version `v`; returns its
    * manifest entries. Bucketed segments repartition ON the bucket id so
    * each bucket is exactly one task → one sorted file per bucket dir. */
  private def writeSegment(df: DataFrame, tableDir: String, v: Long,
      tag: String, bucket: Option[BucketSpec]): Seq[(Int, String)] = {
    val rel = s"seg/v$v-$tag"
    val abs = s"$tableDir/$rel"
    bucket match {
      case Some(bs) =>
        val withB = df.withColumn(BucketCol, bucketExpr(col(bs.col), bs.buckets))
        val sorted = withB.repartition(bs.buckets, col(BucketCol))
          .sortWithinPartitions((BucketCol +: bs.sortBy).map(col): _*)
        sorted.write.mode("overwrite").partitionBy(BucketCol).parquet(abs)
        val segDir = Paths.get(abs)
        if (!Files.exists(segDir)) Seq.empty
        else Files.list(segDir).iterator().asScala.toSeq
          .map(_.getFileName.toString)
          .filter(_.startsWith(s"$BucketCol="))
          .map(d => (d.stripPrefix(s"$BucketCol=").toInt, s"$rel/$d"))
          .sortBy(_._1)
      case None =>
        df.write.mode("overwrite").parquet(abs)
        Seq((-1, rel))
    }
  }

  /** Commit `entries` as version `v`: write _MANIFEST, swap the pointer. */
  private def commit(tableDir: String, v: Long, entries: Seq[(Int, String)]): Unit = {
    val dir = Paths.get(tableDir)
    val body = entries.map { case (b, p) => s"$b\t$p" }.mkString("\n")
    Files.write(dir.resolve(s"v$v").resolve("_MANIFEST"), body.getBytes)
    val tmp = dir.resolve(s"_CURRENT.tmp$v")
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Upsert `batch` into the snapshot at `tableDir`.
    *
    * @param keys       natural-key columns (e.g. event_id)
    * @param orderBy    LWW ordering columns, greatest wins (e.g. timestamp)
    * @param changeCols if set, an existing row is only replaced when at
    *                   least one of these columns IS DISTINCT FROM the
    *                   incoming value (SCD-1 change detection)
    * @param bucket     if set, the snapshot is hash-bucketed on
    *                   `bucket.col` and the merge reads+rewrites ONLY the
    *                   buckets present in the batch
    */
  def merge(spark: SparkSession, tableDir: String, batch: DataFrame,
      keys: Seq[String], orderBy: Seq[String],
      changeCols: Option[Seq[String]] = None,
      bucket: Option[BucketSpec] = None): MergeResult = {
    require(keys.nonEmpty, "merge requires key columns")
    val cols = batch.columns.toSeq

    // 1. deterministic LWW dedup of the incoming batch
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy.map(c => col(c).desc): _*)
    val deduped = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val entries = manifestEntries(tableDir)
    // A bucketed merge can skip untouched buckets only when every prior
    // segment is bucketed; any unbucketed (legacy/append) segment may
    // hold rows of a touched key, so it forces a one-time full rewrite
    // that migrates the table to the bucketed layout.
    val allBucketed = entries.forall(_._1 >= 0)
    val (oldSide0, carried) = bucket match {
      case Some(bs) if allBucketed =>
        val touched = deduped
          .select(bucketExpr(col(bs.col), bs.buckets).as(BucketCol))
          .distinct().collect().map(_.getInt(0)).toSet // ≤ buckets ints — metadata
        val (touchedE, untouchedE) = entries.partition(e => touched.contains(e._1))
        (readPaths(spark, tableDir, batch.schema, touchedE.map(_._2)), untouchedE)
      case _ =>
        (readSnapshot(spark, tableDir, batch.schema), Seq.empty[(Int, String)])
    }
    val snapshot = oldSide0.select(cols.map(col): _*)

    // 2. full-outer merge (touched buckets only when bucketed), batch
    //    wins unless change-detection says no-op
    val oldSide = snapshot.select(cols.map(c => col(c).as(s"__old_$c")): _*)
      .withColumn("__old_present", lit(true))
    val newSide = deduped.select(cols.map(c => col(c).as(s"__new_$c")): _*)
      .withColumn("__new_present", lit(true))
    val joinCond = keys.map(k => col(s"__old_$k") <=> col(s"__new_$k"))
      .reduce(_ && _)
    val joined = oldSide.join(newSide, joinCond, "full_outer")

    val changed = changeCols match {
      case Some(cc) if cc.nonEmpty =>
        cc.map(c => !(col(s"__old_$c") <=> col(s"__new_$c"))).reduce(_ || _)
      case _ => lit(true)
    }
    val takeNew = col("__old_present").isNull ||
      (col("__new_present").isNotNull && changed)
    val resolved = joined.select(cols.map { c =>
      when(takeNew, col(s"__new_$c")).otherwise(col(s"__old_$c")).as(c)
    }: _*)

    // 3. claim v{n+1} (writer lock), write only the merged segment,
    //    commit manifest = carried-over untouched buckets + new segment
    val next = claimVersion(tableDir)
    val newEntries = writeSegment(resolved, tableDir, next, "merge", bucket)
    commit(tableDir, next, carried ++ newEntries)
    MergeResult(next, readSnapshot(spark, tableDir, batch.schema).count())
  }

  /** O(batch) append: write ONLY the new rows as a segment and commit a
    * manifest that reuses every existing segment file untouched — the
    * plain-INSERT path (L5/L6 append-only logs). Repeated appends to a
    * bucketed table accumulate per-bucket files; the next `merge`
    * compacts each touched bucket back to one sorted file. */
  def appendSegment(spark: SparkSession, tableDir: String, batch: DataFrame,
      bucket: Option[BucketSpec] = None): Long = {
    val prior = manifestEntries(tableDir)
    val next = claimVersion(tableDir)
    val newEntries = writeSegment(batch, tableDir, next, "append", bucket)
    commit(tableDir, next, prior ++ newEntries)
    next
  }

  /** Full-rewrite commit of `df` as the next snapshot version — the path
    * for whole-table transforms (updateOnly, cascadeDelete, bootstrap).
    * Holds the same writer lock as merge/append. */
  def publish(spark: SparkSession, tableDir: String, df: DataFrame,
      bucket: Option[BucketSpec] = None): Long = {
    val next = claimVersion(tableDir)
    val newEntries = writeSegment(df, tableDir, next, "full", bucket)
    commit(tableDir, next, newEntries)
    next
  }
}
