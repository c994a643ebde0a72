package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations over `events` — the batch-semantics
  * twins of the Structured-Streaming windows (same `window`/
  * `session_window` operators run identically under `readStream`; see
  * graft.etl.Streaming for the streaming wiring).
  *
  * The reference itself has no windows (SURVEY §2.5); these cover the
  * tumbling/sliding/session family a training-data pipeline needs for
  * time-bucketed corpus stats.
  */
object Windows {
  import Num._

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsNorm(s, dir)

  val defs: Map[String, QueryDef] = Map(
    // tumbling 1-day windows per event type
    "win_tumbling_daily" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .groupBy(window($"ts", "1 day").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"), dbl(sum(dec($"value"))).as("total_value"))
          .select(unix_micros($"w.start").as("day_us"), $"event_type", $"n", $"total_value")
      },
      oracle = Some("""
        SELECT epoch_us(date_trunc('day', ts)) AS day_us, event_type,
               count(*) AS n,
               CAST(sum(value::DECIMAL(12,2)) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2"""),
      doc = "tumbling window: 1-day buckets per event type"),

    // sliding 2-day windows advancing 1 day
    "win_sliding_2d_1d" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .groupBy(window($"ts", "2 days", "1 day").as("w"))
          .agg(count(lit(1)).as("n"), dbl(sum(dec($"value"))).as("total_value"))
          .select(unix_micros($"w.start").as("w_start_us"), $"n", $"total_value")
      },
      oracle = Some("""
        WITH expanded AS (
          SELECT date_trunc('day', ts) - to_days(o::INTEGER) AS w_start, value
          FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o) offs)
        SELECT epoch_us(w_start) AS w_start_us, count(*) AS n,
               CAST(sum(value::DECIMAL(12,2)) AS DOUBLE) AS total_value
        FROM expanded GROUP BY 1"""),
      doc = "sliding window: 2-day span, 1-day slide (each event in 2 windows)"),

    // session windows: 30-minute inactivity gap per user
    "win_session_30m" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        ev(s, dir)
          .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
          .agg(count(lit(1)).as("n_events"), dbl(sum(dec($"value"))).as("total_value"))
          .select($"user_id", unix_micros($"w.start").as("session_start_us"),
            $"n_events", $"total_value")
      },
      oracle = Some("""
        WITH ordered AS (
          SELECT user_id, ts, value, event_id,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           >= INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        islands AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM ordered)
        SELECT user_id, epoch_us(min(ts)) AS session_start_us,
               count(*) AS n_events,
               CAST(sum(value::DECIMAL(12,2)) AS DOUBLE) AS total_value
        FROM islands GROUP BY user_id, session_id"""),
      doc = "session window: 30-min gap sessionization (gaps-and-islands oracle)")
  )
}
