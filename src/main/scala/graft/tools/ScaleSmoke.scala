package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}

/** One-off ×K scale smoke for the dedup/similarity family: synthesizes
  * a K×-larger corpus from sf0.1 by unioning re-keyed copies, then
  * times the heavy hitters at ×1 vs ×K — the empirical check behind
  * the "banded join scales ~linearly" claims (results recorded in
  * PLANS.md §scale-smoke).
  *
  * Copy construction preserves the SIMILARITY STRUCTURE instead of
  * multiplying it: each copy's tokens are suffixed with the copy id, so
  * shingle/token overlap across copies is zero and the true near-dup
  * pair count grows ~K. (A naive byte-copy would give every doc K-1
  * identical twins — K² the candidate pairs — and measure a DIFFERENT
  * corpus, not a bigger one.) Embedding vectors keep their values: the
  * exact pair-join family is O(n²) by declared design, so it runs at a
  * smaller K and the expectation there is ~K² pair work with bounded
  * per-task size (the auto-derived block count absorbs the growth),
  * not linearity.
  *
  * Usage: sbt "runMain graft.tools.ScaleSmoke"
  */
object ScaleSmoke {

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

    /** ×k corpus under /tmp (built once, reused across runs). */
    def corpus(k: Int): String = {
      if (k == 1) return sf
      val out = s"/tmp/graft-scale/x$k"
      if (!Files.exists(Paths.get(s"$out/embeddings.parquet"))) {
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        (0 until k).map { i =>
          if (i == 0) docs
          else docs
            .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
            .withColumn("text", concat_ws(" ",
              expr(s"transform(split(trim(text), '\\\\s+'), t -> concat(t, '_$i'))")))
        }.reduce(_ unionByName _)
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
        val emb = spark.read.parquet(s"$sf/embeddings.parquet")
        (0 until k).map { i =>
          if (i == 0) emb
          else emb.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        }.reduce(_ unionByName _)
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      }
      out
    }

    def time(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).collect().length.toLong
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.isolate(spark)
      (sec, n)
    }

    // JIT warm-up (not timed)
    val warm = "/root/testdata/sf0.001"
    // corpus organization rides along since round 12: per-doc scans +
    // bounded-metadata prefix sum, expected ~K wall (the packing's
    // derived bucket count and two-phase offsets must not introduce
    // any super-linear stage)
    val linear = Seq("dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_ngram_jaccard", "txt_hash_split", "txt_pack_chunks")
    val quadratic = Seq("dedup_embedding_cosine", "sim_lsh_bucket_topk")
    (linear ++ quadratic).foreach(q =>
      try { SparkEntry.queries(q)(spark, warm).collect(); () }
      catch { case _: Throwable => () })
    Bench.isolate(spark)

    val runs =
      linear.flatMap(q => Seq((q, 1, "~K expected"), (q, 10, "~K expected"))) ++
      quadratic.flatMap(q => Seq((q, 1, "~K^2 pairs by design"), (q, 3, "~K^2 pairs by design")))
    runs.foreach { case (q, k, expect) =>
      val dir = corpus(k)
      val (sec, rows) = time(q, dir)
      println(f"""{"query":"$q","scale":$k,"sec":$sec%.2f,"rows":$rows,"expect":"$expect"}""")
    }
    spark.stop()
  }
}
