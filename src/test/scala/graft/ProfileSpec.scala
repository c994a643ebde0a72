package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the profile paths the corpus can't: the testdata has no
  * NULLs, so qa_profile's null counters read 0 there — here nulls are
  * injected and must be counted exactly, and distinct counts must
  * exclude them (SQL COUNT(DISTINCT) semantics in both engines).
  */
class ProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("qa_profile: one row per column, corpus null counts are zero") {
    val rows = SparkEntry.queries("qa_profile")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("event_id", "event_type", "props", "ts", "user_id", "value"))
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, s"${r.getString(0)}: corpus has no nulls")
      assert(r.getLong(2) > 0L, s"${r.getString(0)}: distinct must be positive")
    }
  }

  test("injected nulls are counted and excluded from distinct") {
    import spark.implicits._
    val ev = Tables.eventsNorm(spark, sf)
      .withColumn("props", when($"event_id" % 3 === 0, lit(null)).otherwise($"props"))
      .withColumn("value", when($"event_id" % 5 === 0, lit(null)).otherwise($"value"))
    val n = ev.count()
    val expectedPropsNulls = ev.filter($"props".isNull).count()
    val prof = graft.ext.Profile.profileEvents(ev)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof("props").getLong(1) == expectedPropsNulls)
    assert(prof("value").getLong(1) == ev.filter($"value".isNull).count())
    assert(prof("event_id").getLong(1) == 0L)
    // distinct excludes nulls: distinct(props) must not exceed non-null rows
    assert(prof("props").getLong(2) <= n - expectedPropsNulls)
    // min/max render over the non-null population only
    assert(prof("props").getString(3) != null)
  }
}
