package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY measurement harness — not part of the library; deleted
  * before commit. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    // warm-up
    names.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").collect())
    Bench.isolate(spark)
    (1 to 3).foreach { rep =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        Bench.isolate(spark)
        println(f"PROBE rep$rep $n%-28s $sec%7.3f s")
      }
    }
    spark.stop()
  }
}
