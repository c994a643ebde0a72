package graft

import java.nio.file.{Files, Paths}

/** Batch [[PlanDump]]: write each named query's `explain("formatted")`
  * output to `<outDir>/<name>_<suffix>.txt` — the before/after plan
  * evidence the optimization rounds commit under plans/rNN/.
  *
  *   sbt "Test/runMain graft.PlanFiles plans/r21 before txt_cdc_chunks,dedup_cdc_profile /root/testdata/sf0.01"
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, namesCsv, dir) = args.take(4)
    val spark = Sessions.local(cores = 8, appName = s"graft-planfiles-$suffix")
    try {
      Files.createDirectories(Paths.get(outDir))
      for (name <- namesCsv.split(",").map(_.trim).filter(_.nonEmpty)) {
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query '$name'"))
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"wrote $outDir/${name}_$suffix.txt")
        Bench.isolate(spark)
      }
    } finally spark.stop()
  }
}
