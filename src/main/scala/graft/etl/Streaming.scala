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

  /** Start the FULL ingest stream — the reference's steady state as one
    * micro-batch body. The reference's sync loop fans each batch into
    * three subscriptions feeding the whole upsert family
    * (client.ts:259-284 → db.utils.ts persistMessage/persistParticipant/
    * persistRoom + updateSyncToken); here the foreachBatch body is
    * [[Pipeline.applyBatch]]: decrypt (T8) → quarantine→logs → messages
    * LWW-merge + participants/rooms change-detection merges → sync-token
    * upsert (L8), all against one raw-event micro-batch.
    *
    * Storage maintenance runs on a batch cadence: every `maintainEvery`
    * batches, every catalog table is compacted (fold append stacks /
    * fragmented buckets) and vacuumed (version retention + segment GC).
    * The reference gets this for free from Postgres autovacuum
    * (db.utils.ts:38-46 context); a manifest-over-segments layout at
    * streaming cadence grows a version per merge per batch without it.
    * Safe concurrently with this stream's own writes: maintenance runs
    * INSIDE the foreachBatch body (no self-racing), and vacuum never
    * touches segments above _CURRENT or young claim dirs. */
  def startFullIngest(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      pipeline: Pipeline,
      maxFilesPerTrigger: Int = 50,
      maintainEvery: Int = 16,
      keepVersions: Int = 2): StreamingQuery = {
    val raw = spark.readStream
      .schema(Schemas.rawEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)

    raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(fullIngestBody(pipeline, maintainEvery, keepVersions))
      .start()
  }

  /** The shared E2 micro-batch body: applyBatch + maintenance cadence.
    * Both full-ingest sources (parquet, JSONL) run exactly this, so the
    * semantics specs for one hold for the other. */
  private def fullIngestBody(pipeline: Pipeline, maintainEvery: Int,
      keepVersions: Int): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val s = batch.sparkSession
    pipeline.applyBatch(s, batch, batchId)
    if (maintainEvery > 0 && batchId % maintainEvery == (maintainEvery - 1))
      pipeline.catalog.maintain(s, keepVersions)
    ()
  }

  /** Blocking convenience: full-pipeline twin of [[runOnce]]. */
  def runFullOnce(spark: SparkSession, sourceDir: String,
      checkpointDir: String, pipeline: Pipeline,
      maintainEvery: Int = 16, keepVersions: Int = 2): Unit =
    startFullIngest(spark, sourceDir, checkpointDir, pipeline,
      maintainEvery = maintainEvery, keepVersions = keepVersions)
      .awaitTermination()

  /** [[startFullIngest]] over the JSON-lines wire format instead of
    * parquet: text file-stream → [[Ingest.rawFromJsonLines]] → split.
    * Unparseable lines go to `logs` via [[Pipeline.logCorrupt]] (the T2
    * filter inside applyBatch would otherwise drop them silently — a
    * dead letter must be queryable, never invisible); well-formed rows
    * run the identical micro-batch body, so every semantics spec for
    * the parquet path holds verbatim here. */
  def startFullIngestJsonl(
      spark: SparkSession,
      sourceDir: String,
      checkpointDir: String,
      pipeline: Pipeline,
      maxFilesPerTrigger: Int = 50,
      maintainEvery: Int = 16,
      keepVersions: Int = 2): StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(sourceDir)

    val body = fullIngestBody(pipeline, maintainEvery, keepVersions)
    Ingest.rawFromJsonLines(lines).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.col
        pipeline.logCorrupt(batch.sparkSession,
          batch.filter(col("event_type") === "m.graft.corrupt"))
        body(batch.filter(col("event_type") =!= "m.graft.corrupt"), batchId)
      }
      .start()
  }
}
