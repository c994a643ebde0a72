package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Bench, SparkEntry}

/** Measured-decade evidence for the round-20 continuation families'
  * 100 TB claims, over the shared ScaleSmoke ×K corpora
  * (/tmp/graft-scale/v2 — rotated/sign-flipped embedding copies,
  * suffix-tokenized document copies; ×1 = sf0.1 itself):
  *
  *  - `sim_pq_encode`: one broadcast-join pass + a vec_id-partitioned
  *    argmin — wall should grow ~K (the broadcast side is m·k rows and
  *    never grows).
  *  - `sim_pq_adc_topk`: the compressed-domain scan — candidates are
  *    never pruned (PQ compresses, IVF prunes), so wall grows ~K with
  *    a small constant: each candidate costs m LUT lookups + adds over
  *    4 ints, not a 64-float distance.
  *  - `sim_ivfpq_topk`: the composed read — candidate count is
  *    n·nprobe/k, so wall should ALSO grow ~K but from a ~5× smaller
  *    base than plain ADC at k=10/nprobe=2 (min-of-2 absorbs the
  *    one-time persisted-index build on the first rep).
  *  - `txt_cdc_chunks` / `dedup_cdc_profile`: per-row O(W·len) lambda
  *    + explode (+ one md5 hash-agg for the profile) — wall grows ~K.
  *
  * min-of-2 per point after an sf0.001 JIT warm-up (the ScaleSmoke
  * discipline). Results → PLANS.md decade table.
  *
  * Usage: sbt "runMain graft.tools.PqCdcSmoke"
  */
object PqCdcSmoke {

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shared ScaleSmoke construction — builds the corpus if absent
    def corpus(k: Int): String = ScaleCorpus.ensure(spark, sf, k)

    val entries = Seq("sim_pq_encode", "sim_pq_adc_topk", "sim_ivfpq_topk",
      "sim_ivfpq_persisted_topk", "txt_cdc_chunks", "dedup_cdc_profile",
      "dedup_cdc_incremental")

    // JIT warm-up (not timed)
    entries.foreach { e =>
      SparkEntry.queries(e)(spark, "/root/testdata/sf0.001").collect()
      Bench.isolate(spark)
    }

    def time(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).collect().length.toLong
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.isolate(spark)
      (sec, n)
    }

    val decades = Seq(1, 10, 100)
    println(f"${"entry"}%-20s ${"K"}%4s ${"wall_s"}%8s ${"rows"}%9s")
    for (name <- entries; k <- decades) {
      val dir = corpus(k)
      val (sec, rows) = Seq(time(name, dir), time(name, dir)).minBy(_._1)
      println(f"$name%-20s $k%4d $sec%8.2f $rows%9d")
    }
    spark.stop()
  }
}
