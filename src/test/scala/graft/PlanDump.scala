package graft

/** Print a registered query's formatted executed plan — the one-liner
  * PLANS.md tells you exists:
  *   sbt "Test/runMain graft.PlanDump q16_distinct_suppliers /root/testdata/sf0.01"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(cores = 8, appName = s"graft-plan-$name")
    try {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      fn(spark, dir).explain("formatted")
    } finally spark.stop()
  }
}
