package graft.tools

import graft.Bench
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial decade smoke for the keeper-election pair
  * (`dedup_keeper_quality` vs `dedup_keeper_salted`): ONE giant
  * cluster of N scored documents — the worst case the corpus-wide
  * analysis election's scaladoc warns about, where a single
  * `row_number` window partition holds the whole corpus and lands on
  * one task — timed at N = 10⁵/10⁶/10⁷ through both election shapes.
  *
  * Extracted-code discipline: the two timed bodies are the EXACT
  * window chains the registered entries run (single window over
  * cluster_id; two-phase over (cluster_id, doc_id % 16) then the
  * partial winners), driven to evaluation by a keeper checksum. The
  * in-line assert pins equivalence on every decade: both shapes must
  * elect the SAME keeper (the total order per cluster makes
  * max-of-partial-maxes the global max).
  *
  * Quality is a deterministic hash-derived double (xxhash64 → [0,1)),
  * so reruns are reproducible and ties are broken by the same
  * (quality DESC, doc_id ASC) key the entries use.
  *
  * Usage: sbt "runMain graft.tools.ElectSmoke"
  */
object ElectSmoke {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scored(n: Long): DataFrame = spark.range(0L, n, 1, 32)
      .select(col("id").as("doc_id"), lit(0L).as("cluster_id"),
        (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 1e6)
          .as("quality"))

    // BOTH bodies below are the REGISTERED entries' output shape: every
    // row tagged with its keep flag. That detail decides the physics —
    // a `filter(rk === 1)` would let Catalyst plan WindowGroupLimitExec
    // (map-side partial top-1 per input partition, skew-immune even for
    // a giant cluster), but the entries EMIT ALL ROWS, so no rank-limit
    // pushdown applies and the single-window shape must materialize the
    // full sort of the giant partition on one task.

    /** the dedup_keeper_quality shape: one window, all rows tagged */
    def single(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      df.withColumn("rk", row_number().over(w))
        .select(col("cluster_id"), col("doc_id"),
          (col("rk") === 1).as("keep"))
    }

    /** the dedup_keeper_salted shape: bounded filtered phases (these DO
      * take the group-limit path) elect the winner, then the winner
      * joins back to tag all rows */
    def salted(df: DataFrame): DataFrame = {
      val w1 = Window.partitionBy(col("cluster_id"), pmod(col("doc_id"), lit(16)))
        .orderBy(col("quality").desc, col("doc_id").asc)
      val w2 = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      val winners = df
        .withColumn("rk1", row_number().over(w1)).filter(col("rk1") === 1)
        .withColumn("rk2", row_number().over(w2)).filter(col("rk2") === 1)
        .select(col("cluster_id"), col("doc_id").as("keep_doc"))
      df.join(broadcast(winners), "cluster_id")
        .select(col("cluster_id"), col("doc_id"),
          (col("doc_id") === col("keep_doc")).as("keep"))
    }

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val v = body
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.isolate(spark)
      (sec, v)
    }

    // warm-up (untimed)
    single(scored(10000L)).collect(); salted(scored(10000L)).collect()
    Bench.isolate(spark)

    for (n <- Seq(100000L, 1000000L, 10000000L)) {
      val df = scored(n)
      def run(shape: DataFrame => DataFrame): (Double, Long) = {
        def body: Long = {
          val r = shape(df)
            .agg(sum(when(col("keep"), col("doc_id"))), count(lit(1)))
            .collect()(0)
          // row conservation: the tagged output carries every document
          require(r.getLong(1) == n, s"lost rows: ${r.getLong(1)} of $n")
          r.getLong(0)
        }
        val p1 = timed(body)
        val p2 = timed(body)
        (math.min(p1._1, p2._1), p1._2)
      }
      val (sSec, sKeep) = run(single)
      val (tSec, tKeep) = run(salted)
      assert(sKeep == tKeep,
        s"salted election diverged from single-window at n=$n: $sKeep vs $tKeep")
      println(f"""{"elect":"giant_cluster","n":$n,"keeper":$sKeep,"single_sec":$sSec%.2f,"salted_sec":$tSec%.2f,"speedup":${sSec / tSec}%.2f}""")
    }
    spark.stop()
  }
}
