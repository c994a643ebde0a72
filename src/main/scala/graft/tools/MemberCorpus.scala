package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared member-event corpus generator for the T4 decade smokes
  * ([[MemberSmoke]], [[StateSmoke]]) — one generator, so the two
  * smokes cannot drift in what "a member event corpus" means.
  *
  * events → member-event raw rows for copy `i`, DISJOINT rooms per
  * copy (1000 rooms/copy, ~100 members/room): growth adds rooms at
  * constant per-room mass, the realistic federation shape. The
  * displayname mix (by user_id%10) covers the semantics the projection
  * implements: 0–5 a pool of 97 colliding names; 6/7 the SAME name as
  * composed U+00E9 vs decomposed e+U+0301 (NFD collision); 8 numeric
  * (non-STRING → falsy); 9 absent (falsy). */
object MemberCorpus {

  /** `senderPrefix`/`idOffset` let a caller mint a batch of NEW users
    * (disjoint from the seeded corpus) whose names still draw from the
    * same collision pool — the [[StateSmoke]] joiner batch.
    *
    * `ev.ts` must be TimestampType — callers read via
    * [[graft.Tables.eventsNorm]], which normalizes both parquet
    * generations (timestamp[us] and legacy ns-as-Long) before the
    * `unix_millis` below. */
  def memberShape(ev: DataFrame, i: Int, senderPrefix: String = "@u",
      idOffset: Long = 0L): DataFrame = {
    val mode = pmod(col("user_id"), lit(10L))
    val pool = pmod(col("user_id"), lit(97L))
    val dnJson = when(mode <= 5, concat(lit("\"Name"), pool, lit("\"")))
      .when(mode === 6, concat(lit("\"Jos\u00E9"), pool, lit("\"")))
      .when(mode === 7, concat(lit("\"José"), pool, lit("\"")))
      .when(mode === 8, col("user_id").cast("string")) // bare number
      .otherwise(lit(null).cast("string"))             // absent key
    val content = concat(lit("{\"membership\":\"join\""),
      when(dnJson.isNotNull, concat(lit(",\"displayname\":"), dnJson))
        .otherwise(lit("")),
      lit("}"))
    ev.select(
      concat(lit("$m"), col("event_id") + lit(i * 10000000L + idOffset), lit(":x"))
        .as("event_id"),
      concat(lit("!r"), pmod(col("event_id"), lit(1000L)) + lit(i * 1000L), lit(":x"))
        .as("room_id"),
      concat(lit(senderPrefix), col("user_id"), lit(":x")).as("sender"),
      lit("m.room.member").as("event_type"),
      unix_millis(col("ts")).as("origin_server_ts"),
      content.as("content"),
      lit(null).cast("string").as("relates_to"),
      lit(false).as("is_encrypted"),
      lit(false).as("to_start_of_timeline"),
      lit(null).cast("string").as("error"))
  }
}
