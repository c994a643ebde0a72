package graft.etl

import org.apache.spark.sql.types._

/** StructType mirrors of the reference's data model
  * (`src/server/db/schema.ts`, with the SURVEY §1.5 drift decisions
  * applied: canonical `room_id`, derived `users`, unified `sync_state`).
  *
  * JSONB columns travel as StringType holding JSON (exactly what the
  * reference's `JSON.stringify` produces, db.utils.ts:53,57); query
  * them via `from_json`/`get_json_object`.
  */
object Schemas {

  /** schema.ts:55-70 (messages) */
  val messages: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("event_id", StringType, nullable = false),
    StructField("room_id", StringType, nullable = false),
    StructField("sender", StringType),
    StructField("content", StringType),       // JSONB → JSON string
    StructField("event_type", StringType),
    StructField("timestamp", LongType),       // epoch millis (event.getTs())
    StructField("is_encrypted", BooleanType),
    StructField("relates_to", StringType),    // JSONB → JSON string
    StructField("error", StringType),         // dead-letter-in-row channel
    StructField("processed_at", TimestampType)))

  /** schema.ts:26-38 (rooms; canonical room_id per SURVEY §1.5) */
  val rooms: StructType = StructType(Seq(
    StructField("room_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("topic", StringType),
    StructField("membership", StringType),
    StructField("is_encrypted", BooleanType),
    StructField("created_ts", LongType),
    StructField("avatar_url", StringType),
    StructField("last_updated", TimestampType),
    StructField("created_at", TimestampType)))

  /** schema.ts:40-53 (participants; composite key user_id+room_id) */
  val participants: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("room_id", StringType, nullable = false),
    StructField("display_name", StringType),
    StructField("avatar_url", StringType),
    StructField("membership", StringType),
    StructField("joined_ts", LongType),
    StructField("last_updated", TimestampType),
    StructField("created_at", TimestampType)))

  /** schema.ts:18-24 (sync_state — the streaming checkpoint analog) */
  val syncState: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("next_batch", StringType, nullable = false),
    StructField("created_at", TimestampType)))

  /** schema.ts:2-16 (auth_credentials incl. 32-byte binary storage key) */
  val authCredentials: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("device_id", StringType),
    StructField("access_token", StringType),
    StructField("refresh_token", StringType),
    StructField("domain", StringType),
    StructField("homeserver_url", StringType),
    StructField("storage_key", BinaryType),
    StructField("expires_in_ms", LongType),
    StructField("created_at", TimestampType)))

  /** schema.ts:72-78 (key_backup_status, append-only) */
  val keyBackupStatus: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("status", BooleanType),
    StructField("created_at", TimestampType)))

  /** implied by routes.ts:239 (GET /logs) — SURVEY §1.5 */
  val logs: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("level", StringType),
    StructField("message", StringType)))

  /** FIXTURES.md §A1: raw Matrix timeline event (the ingest input) */
  val rawEvent: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("room_id", StringType, nullable = false),
    StructField("sender", StringType),
    StructField("event_type", StringType),
    StructField("origin_server_ts", LongType),
    StructField("content", StringType),
    StructField("relates_to", StringType),
    StructField("is_encrypted", BooleanType),
    StructField("to_start_of_timeline", BooleanType),
    StructField("error", StringType)))
}
