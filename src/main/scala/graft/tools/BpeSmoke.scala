package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench
import graft.ext.Bpe

/** Measured-decade evidence for `txt_bpe_train`'s 100 TB claim: BPE
  * training is one corpus pass (pre-token counts → the vocabulary)
  * followed by rounds that touch ONLY the vocabulary. If that is true,
  * the corpus pass grows ~K with corpus size while the 9 training
  * rounds stay ~flat — because a K×-duplicated corpus multiplies
  * COUNTS, not distinct pieces (the ×K copies suffix tokens with the
  * copy id, which the `[a-z0-9]+|[^a-z0-9\s]` pre-tokenizer splits
  * off, so the vocabulary gains only the suffix pieces: "_" and the
  * copy numerals — ~K small entries on a corpus-sized base).
  *
  * Reuses the ScaleSmoke ×K corpora under /tmp/graft-scale/v2 (same
  * construction, built once, throwaway work copies); ×1 is sf0.1
  * itself. Each decade reports: vocabulary-build wall (the corpus
  * pass), |vocab|, and the 9-round training wall (the vocab loop).
  * min-of-2 per point after a sf0.001 JIT warm-up.
  *
  * Usage: sbt "runMain graft.tools.BpeSmoke"   (results → PLANS.md)
  */
object BpeSmoke {

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

    // JIT warm-up (not timed): the full path once at sf0.001
    Bpe.trainMerges(spark, "/root/testdata/sf0.001", 3)
    Bench.isolate(spark)

    val decades = Seq(1, 10, 100)
    println(f"${"K"}%4s ${"docs"}%9s ${"t_vocab_s"}%10s ${"|vocab|"}%9s ${"t_rounds_s"}%11s")
    decades.foreach { k =>
      val dir = corpus(k)
      // min-of-2 for both phases (the ScaleSmoke discipline)
      val (tv, nv, tr) = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val vocab = Bpe.pretokenVocab(spark, dir)
        val n = vocab.count()
        val tVocab = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val learned = Bpe.trainOnVocab(vocab, 9)
        require(learned.length == 9)
        val tRounds = (System.nanoTime() - t1) / 1e9
        Bench.isolate(spark)
        (tVocab, n, tRounds)
      }.minBy(t => t._1 + t._3)
      val docs = spark.read.parquet(s"$dir/documents.parquet").count()
      println(f"$k%4d $docs%9d $tv%10.2f $nv%9d $tr%11.2f")
    }
    spark.stop()
  }
}
