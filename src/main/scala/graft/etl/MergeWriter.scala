package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic upsert ("merge-on-write") over a versioned parquet snapshot —
  * the Spark re-expression of the reference's `ON CONFLICT … DO UPDATE`
  * family (src/server/utils/db.utils.ts:30-66, 68-104, 106-152, 282-290).
  *
  * Semantics:
  *  - batch is first deduplicated per key, keeping the greatest
  *    `orderBy` tuple (deterministic last-write-wins; SURVEY §7.4 risk 2);
  *  - snapshot ⟗ batch on the key; batch side wins, except when
  *    `changeCols` is set and none of the tracked columns differ
  *    (`IS DISTINCT FROM` ⇄ negated `<=>` — the reference's SCD-1
  *    change-detection, db.utils.ts:82-86), in which case the existing
  *    row is kept untouched;
  *  - the result is written to a NEW versioned directory `v{n+1}/`, then
  *    a pointer file is atomically swapped (SURVEY §7.4 risk 1) so
  *    concurrent readers never observe a partial snapshot.
  *
  * Scale notes: the merge is one shuffle on the key columns (the
  * full-outer join); at cluster scale the snapshot would be bucketed by
  * key so only the batch side shuffles. Change-detection avoids
  * rewriting unchanged rows' *values*, mirroring the reference's
  * `IS DISTINCT FROM` dead-tuple optimization.
  */
object MergeWriter {

  final case class MergeResult(version: Long, rows: Long)

  private def pointer(tableDir: Path): Path = tableDir.resolve("_CURRENT")

  /** Current snapshot version, or None before the first merge. */
  def currentVersion(tableDir: String): Option[Long] = {
    val p = pointer(Paths.get(tableDir))
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toLong)
    else None
  }

  /** Read the current snapshot (empty frame with `schema` if absent). */
  def readSnapshot(spark: SparkSession, tableDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    currentVersion(tableDir) match {
      case Some(v) => spark.read.parquet(s"$tableDir/v$v")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Upsert `batch` into the snapshot at `tableDir`.
    *
    * @param keys       natural-key columns (e.g. event_id)
    * @param orderBy    LWW ordering columns, greatest wins (e.g. timestamp)
    * @param changeCols if set, an existing row is only replaced when at
    *                   least one of these columns IS DISTINCT FROM the
    *                   incoming value (SCD-1 change detection)
    */
  def merge(spark: SparkSession, tableDir: String, batch: DataFrame,
      keys: Seq[String], orderBy: Seq[String],
      changeCols: Option[Seq[String]] = None): MergeResult = {
    require(keys.nonEmpty, "merge requires key columns")
    val cols = batch.columns.toSeq
    val snapshot = readSnapshot(spark, tableDir, batch.schema)

    // 1. deterministic LWW dedup of the incoming batch
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy.map(c => col(c).desc): _*)
    val deduped = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    // 2. full-outer merge, batch wins unless change-detection says no-op
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

    // 3. write v{n+1}, atomically swap the pointer
    val next = publish(spark, tableDir, resolved)
    MergeResult(next, spark.read.parquet(s"$tableDir/v$next").count())
  }

  /** Write `df` as the next snapshot version and atomically swap the
    * pointer file — the commit protocol every writer path shares. */
  def publish(spark: SparkSession, tableDir: String, df: DataFrame): Long = {
    val next = currentVersion(tableDir).getOrElse(-1L) + 1
    df.write.mode("overwrite").parquet(s"$tableDir/v$next")
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"_CURRENT.tmp$next")
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }
}
