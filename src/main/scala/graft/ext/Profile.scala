package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the audit pass a pipeline runs before
  * admitting a new drop of data (the deequ/dbt-test niche): per-column
  * null counts, exact distinct cardinalities, and min/max rendered to
  * a type-stable string surface.
  *
  * Plan shape: ONE aggregate over the scan computes all 6×4 statistics
  * (the multi-distinct is planned by Catalyst as a single Expand+
  * shuffle, ×6 row expansion), then a 1-row stack() pivots wide →
  * long. At 100 TB the exact-distinct Expand is the knob you'd turn
  * first — swap countDistinct for approx_count_distinct and the plan
  * loses the expansion entirely (the qx_approx_distinct entry is that
  * sketch path, 5%-bounded against its exact twin).
  *
  * String surface rules (both engines must format identically):
  * timestamps via an explicit pattern, doubles through DECIMAL(18,2)
  * (exact 2-decimal corpus values), integers/strings as-is.
  *
  * Reference basis: no profiling exists in the reference (SURVEY §2) —
  * extended-surface operator per the builder brief.
  */
object Profile {

  /** The single-pass profile body over the events shape — exposed so
    * the spec can drive it with injected nulls (the corpus itself has
    * none, so the null-counting path needs a synthetic exercise). */
  def profileEvents(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")
    def dist(c: String) = countDistinct(col(c)).as(s"${c}_distinct")
    type C = org.apache.spark.sql.Column
    val asStr: Map[String, C => C] = Map[String, C => C](
      "ts" -> ((c: C) => date_format(c, "yyyy-MM-dd HH:mm:ss")),
      "value" -> ((c: C) => c.cast("decimal(18,2)").cast("string"))
    ).withDefaultValue((c: C) => c.cast("string"))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val aggs = cols.flatMap { c =>
      val f = asStr(c)
      Seq(nulls(c), dist(c), f(min(col(c))).as(s"${c}_min"), f(max(col(c))).as(s"${c}_max"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max").mkString(", ")
    ev.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_s, max_s)"))
  }

  val defs: Map[String, QueryDef] = Map(
    "qa_profile" -> QueryDef(
      build = (s, dir) => profileEvents(Tables.eventsNorm(s, dir)),
      oracle = Some {
        def render(c: String) = c match {
          case "ts" => (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
          case "value" => (e: String) => s"CAST($e::DECIMAL(18,2) AS VARCHAR)"
          case _ => (e: String) => s"CAST($e AS VARCHAR)"
        }
        Seq("event_id", "ts", "user_id", "event_type", "value", "props").map { c =>
          val f = render(c)
          s"""SELECT '$c' AS col_name,
               CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
               ${f(s"min($c)")} AS min_s,
               ${f(s"max($c)")} AS max_s
             FROM events"""
        }.mkString("\nUNION ALL\n")
      },
      doc = "per-column profile (nulls, exact distinct, min/max) in one aggregate pass")
  )
}
