package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingest: the Spark re-expression of the
  * reference's /sync loop (SURVEY §2.7).
  *
  *  - source: file stream over raw-event parquet (the stand-in for the
  *    homeserver long-poll; `maxFilesPerTrigger` ≈ initialSyncLimit,
  *    client.ts:90);
  *  - per micro-batch: T1→T2→T3 projection then MergeWriter upsert on
  *    `event_id` — at-least-once delivery + idempotent merge =
  *    effectively-once, exactly the reference's contract
  *    (db.utils.ts:36-47);
  *  - checkpointLocation ≙ the `sync_state.next_batch` token
  *    (db.utils.ts:271-290): resume-from-checkpoint reprocesses nothing,
  *    and a cold start with an existing snapshot is the reference's
  *    "token present ⇒ skip initial fetch" branch (client.ts:304-314);
  *  - no watermark on the ingest path by design: the reference accepts
  *    late events forever and upserts them (SURVEY §2.7 late-data row).
  */
object Streaming {

  /** Start the message-ingest stream.
    *
    * @param sourceDir     directory watched for raw-event parquet files
    * @param checkpointDir streaming checkpoint (≙ sync token)
    * @param tableDir      MergeWriter snapshot dir for `messages`
    */
  def startMessageIngest(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      tableDir: String,
      maxFilesPerTrigger: Int = 50,
      bucket: Option[MergeWriter.BucketSpec] = None): StreamingQuery = {
    val raw = spark.readStream
      .schema(Schemas.rawEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

    Ingest.messagesFromRaw(raw).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Batch-wins statement semantics (like the reference's ON
        // CONFLICT DO UPDATE): the (timestamp, id) ordering resolves
        // duplicates WITHIN a batch deterministically; against the
        // snapshot the incoming batch always wins, so a replayed batch
        // is idempotent but a late batch carrying an older event wins
        // over a newer snapshot row — exactly the reference's behavior.
        MergeWriter.merge(batch.sparkSession, tableDir, batch,
          keys = Seq("event_id"), orderBy = Seq("timestamp", "id"),
          bucket = bucket)
        ()
      }
      .start()
  }

  /** Blocking convenience for tests/backfills: process everything
    * currently in `sourceDir`, then stop. */
  def runOnce(spark: SparkSession, sourceDir: String, checkpointDir: String,
      tableDir: String): Unit = {
    val q = startMessageIngest(spark, sourceDir, checkpointDir, tableDir)
    q.awaitTermination()
  }
}
