package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's REST query surface (src/server/api/routes.ts) as a
  * Scala API over Catalog snapshot tables — one function per route,
  * SURVEY §2.4 Q1–Q8 in their true domain shape (the oracle-gated
  * `ref_q*` twins run the same plans over the driver's events table).
  *
  * Auth/rate-limiting/JWT (T11, middlware/auth.ts) are control-plane
  * concerns of the serving web server, intentionally out of engine
  * scope (SURVEY §4 conclusion).
  */
final case class Api(catalog: Catalog) {

  /** Q1 — GET /rooms: rooms ordered by derived last_message_timestamp
    * (routes.ts:92 + SURVEY §1.5: the column doesn't exist in the DDL,
    * so it is an aggregate of messages). */
  def listRooms(spark: SparkSession): DataFrame = {
    val rooms = catalog.read(spark, "rooms")
    val lastMsg = catalog.read(spark, "messages")
      .groupBy(col("room_id"))
      .agg(max(col("timestamp")).as("last_message_timestamp"))
    rooms.join(lastMsg, Seq("room_id"), "left")
      .orderBy(col("last_message_timestamp").desc_nulls_last, col("room_id"))
  }

  /** Q2 — GET /rooms/:id: room + aggregated participant list
    * (routes.ts:106-112; correlated json_agg decorrelated to
    * join + collect_list(struct)). `participants` is bucketed on
    * room_id, so the scan touches one bucket's files. */
  def roomDetail(spark: SparkSession, roomId: String): DataFrame = {
    val room = catalog.read(spark, "rooms").filter(col("room_id") === roomId)
    val parts = catalog.readForKey(spark, "participants", roomId)
      .filter(col("room_id") === roomId)
      .groupBy(col("room_id"))
      .agg(collect_list(struct(
        col("user_id"), col("display_name"), col("avatar_url"),
        col("membership"))).as("participants"))
    room.join(parts, Seq("room_id"), "left")
  }

  /** Q3 — GET /rooms/:id/messages: keyset pagination
    * (routes.ts:126-145; default limit 50). The bucket-pruned read
    * (readForKey) scans ONLY room_id's hash bucket — the Spark analog of
    * the reference's `(room_id, timestamp)` B-tree probe (schema.ts:81);
    * within the bucket, rows are timestamp-sorted so parquet rowgroup
    * min/max stats prune the keyset predicate too.
    *
    * `beforeEvent` extends the reference's timestamp-only cursor to the
    * full sort key (timestamp, event_id): the reference's `timestamp <
    * $before` skips every row TIED on the boundary timestamp when a tie
    * straddles a page break — at millisecond granularity a real room
    * hits this constantly. With the composite cursor, concatenating
    * successive pages equals the full sorted prefix (ApiSpec property);
    * omitting it preserves the reference's exact behavior. */
  def messagesPage(spark: SparkSession, roomId: String,
      before: Option[Long] = None, limit: Int = 50,
      beforeEvent: Option[String] = None): DataFrame = {
    // the keyset cursor doubles as a manifest zone-map bound: segments
    // whose recorded min timestamp is already past `before` are never
    // opened (inclusive bound — the composite cursor keeps rows TIED on
    // the boundary timestamp). The row-level filter below remains the
    // source of truth; pruning only drops provably-disjoint segments.
    val base = catalog.readForKey(spark, "messages", roomId, maxSort = before)
      .filter(col("room_id") === roomId)
    val paged = before.fold(base) { b =>
      beforeEvent.fold(base.filter(col("timestamp") < b)) { e =>
        base.filter(col("timestamp") < b ||
          (col("timestamp") === b && col("event_id") < e))
      }
    }
    paged.orderBy(col("timestamp").desc, col("event_id").desc).limit(limit)
  }

  /** Q4 — GET /users: derived users view, last-write-wins per user
    * (routes.ts:154 + SURVEY §1.5). */
  def listUsers(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("last_updated").desc, col("room_id").desc)
    catalog.read(spark, "participants")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("display_name"), col("avatar_url"))
      .orderBy(col("display_name"), col("user_id"))
  }

  /** Q5 — GET /users/:id: the reference's one explicit join
    * (routes.ts:168-176): user's rooms via participants ⋈ rooms. */
  def userDetail(spark: SparkSession, userId: String): DataFrame = {
    val p = catalog.read(spark, "participants").filter(col("user_id") === userId)
    val r = catalog.read(spark, "rooms")
    p.join(r, Seq("room_id"))
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("room_id"), col("name"), col("topic")))
        .as("rooms"))
  }

  /** Q6 — GET /stats: the five dashboard metrics in ONE job — the
    * uncorrelated scalar subqueries of routes.ts:216-224 plus the two
    * the dashboard expects but the route never computed (SURVEY §1.5),
    * cross-joined single-row aggregates. */
  def stats(spark: SparkSession): DataFrame = {
    val msgs = catalog.read(spark, "messages")
      .agg(count(lit(1)).as("total_messages"))
    val rooms = catalog.read(spark, "rooms").agg(
      count(lit(1)).as("total_rooms"),
      sum(when(col("is_encrypted"), 1L).otherwise(0L)).as("encrypted_rooms"))
    val parts = catalog.read(spark, "participants")
      .agg(count(lit(1)).as("total_participants"))
    val sync = catalog.read(spark, "sync_state")
      .agg(max(col("created_at")).as("last_sync"))
    msgs.crossJoin(rooms).crossJoin(parts).crossJoin(sync)
  }

  /** Q7 — GET /logs (routes.ts:238-241; default limit 100). The scan
    * goes through the zone-map tail read: an append-only log otherwise
    * costs a FULL scan for a 100-row page — the manifest's per-segment
    * max(timestamp) bounds which segments can still reach the page, so
    * a long-running stream's log channel reads its newest segments
    * only. */
  def logsTail(spark: SparkSession, limit: Int = 100): DataFrame =
    catalog.readTail(spark, "logs", limit)
      .orderBy(col("timestamp").desc, col("message")).limit(limit)

  /** Q8 — GET /config singleton (routes.ts:251): latest sync token row. */
  def configSingleton(spark: SparkSession): DataFrame =
    catalog.read(spark, "sync_state")
      .orderBy(col("created_at").desc, col("next_batch").desc).limit(1)
}
