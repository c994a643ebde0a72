package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: persisting both join sides bucketed by the
  * join key removes the per-query shuffle entirely — the 100 TB recipe
  * for repeated fact⋈fact joins (README "Shuffle economics"). The spec
  * proves the property from the physical plan: no ShuffleExchange.
  */
class BucketingSpec extends AnyFunSuite {
  // isolated child session: runtime confs (broadcast threshold, shuffle
  // partitions) must NOT leak into the JVM-shared session other suites
  // use — newSession() gives a private SQLConf over the same context,
  // and going through Sessions.local first keeps the static confs
  // (extensions, nanosAsLong) intact regardless of suite order
  lazy val spark: SparkSession = {
    val s = Sessions.local(cores = 4, appName = "graft-bucketing").newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s
  }

  test("join of two tables bucketed on the key plans with zero shuffles") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // getOrCreate may hand us another suite's session whose (static)
    // warehouse conf differs — drop catalog entries AND their physical
    // locations so a leftover dir can't fail the CTAS
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))

    // executedPlan.collect does not descend into an unexecuted
    // AdaptiveSparkPlan, so assert on the rendered plan: exactly one
    // Exchange (the final groupBy) — the join itself is co-located via
    // bucket metadata; an unbucketed plan has three
    val planStr = joined.queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(nExchanges == 1, s"expected only the agg shuffle:\n$planStr")
    assert(planStr.contains("Bucketed: true"), planStr)

    // and the result matches the unbucketed plan
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
  }
}
