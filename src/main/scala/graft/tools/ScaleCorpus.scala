package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The shared ×K smoke corpus (documents + embeddings), extracted from
  * ScaleSmoke so every decade tool (ScaleSmoke, BpeSmoke, PqCdcSmoke)
  * measures the SAME construction — a private copy in each tool could
  * silently drift and make decades incomparable across tools.
  *
  * Construction (see ScaleSmoke's scaladoc for the full rationale):
  * document copies re-key doc_id and suffix every token with the copy
  * id (zero cross-copy shingle overlap — near-dup structure grows ~K,
  * not K²); embedding copies re-key vec_id and apply one of 128
  * distinct norm-preserving transforms (rotate by i mod 64, sign-flip
  * past 64) so no copy is a cos=1 twin of another.
  *
  * Built once under /tmp/graft-scale/v2/x$k and reused across runs;
  * the version segment invalidates corpora built by earlier smoke
  * revisions (the cache check is existence-only).
  */
object ScaleCorpus {

  /** Returns the directory of the ×k corpus, building it if absent.
    * k == 1 returns `sf` itself.
    */
  def ensure(spark: SparkSession, sf: String, k: Int): String = {
    if (k == 1) return sf
    val cpus = spark.sparkContext.defaultParallelism
    val out = s"/tmp/graft-scale/v2/x$k"
    if (!Files.exists(Paths.get(s"$out/embeddings.parquet"))) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      (0 until k).map { i =>
        if (i == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text", concat_ws(" ",
            expr(s"transform(split(trim(text), '\\\\s+'), t -> concat(t, '_$i'))")))
      }.reduce(_ unionByName _)
        .repartition(cpus)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      (0 until k).map { i =>
        if (i == 0) emb
        else {
          val r = i % 64
          // dimension-agnostic: slice lengths derive from
          // size(embedding), not a hardcoded width
          val base = if (r == 0) "embedding"
            else s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), slice(embedding, 1, $r))"
          val t = if (i >= 64) s"transform($base, x -> -x)" else base
          emb.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
            .withColumn("embedding", expr(t))
        }
      }.reduce(_ unionByName _)
        .repartition(cpus)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    out
  }
}
