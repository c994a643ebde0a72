package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape contracts for the corpus-organization
  * operators (ext/Corpus) that the value-level oracle can't see. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-corpus")
  val sf = "/root/testdata/sf0.01"

  test("txt_hash_split partitions the corpus: counts sum to total, ratios near 80/10/10") {
    val total = Tables.documents(spark, sf).count()
    val rows = SparkEntry.queries("txt_hash_split")(spark, sf)
      .select("split", "n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "validation", "test"))
    assert(rows.values.sum == total, "every doc lands in exactly one split")
    // md5 buckets are uniform; at n=500 the 80% slice stays within a
    // generous ±10pt band — a skewed hash or an off-by-one in the
    // bucket carve would land far outside it
    val trainFrac = rows("train").toDouble / total
    assert(trainFrac > 0.70 && trainFrac < 0.90, s"train fraction $trainFrac")
  }

  test("txt_hash_split is stable under corpus growth: a doc never migrates splits") {
    // assignment depends only on the doc's own id — recompute on a
    // half corpus and check every common doc kept its split
    import spark.implicits._
    def assignments(df: org.apache.spark.sql.DataFrame): Map[Long, String] = df
      .withColumn("bucket", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 100"))
      .withColumn("split", when($"bucket" < 80, "train")
        .when($"bucket" < 90, "validation").otherwise("test"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = assignments(Tables.documents(spark, sf))
    val half = assignments(Tables.documents(spark, sf).filter($"doc_id" % 2 === 0))
    half.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id migrated from ${full(id)} to $s")
    }
  }

  test("txt_pack_chunks conserves tokens and packs in doc_id order") {
    import graft.ext.TextExpr.toksE
    val totalTokens = Tables.documents(spark, sf)
      .withColumn("toks", expr(toksE))
      .agg(sum(size(col("toks")).cast("long"))).head().getLong(0)
    val chunks = SparkEntry.queries("txt_pack_chunks")(spark, sf)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(chunks.map(_._3).sum == totalTokens,
      "every token is packed exactly once")
    // concat-then-chunk over doc_id order ⇒ chunk doc-ranges are
    // disjoint and monotone: chunk k's last doc precedes chunk k+1's
    // first doc
    chunks.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(lastA < firstB, "chunks must cover disjoint, ordered doc ranges")
      case _ => ()
    }
  }

  test("txt_pack_chunks is bucket-count-invariant: {256, 1024, 4096} pack identically") {
    // the range-bucket count is a parallelism knob, not a semantic one —
    // chunk assignment depends only on the global token offsets, which
    // the two-phase prefix sum reconstructs exactly for ANY bucketing
    def run(n: Int): Seq[(Long, Long, Long, Long, Long)] = {
      spark.conf.set("spark.graft.packBuckets", n.toString)
      try SparkEntry.queries("txt_pack_chunks")(spark, sf)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      finally spark.conf.unset("spark.graft.packBuckets")
    }
    val base = run(256)
    assert(base.nonEmpty)
    assert(run(1024) == base, "1024 buckets must pack identically to 256")
    assert(run(4096) == base, "4096 buckets must pack identically to 256")
  }

  test("packBuckets derivation: floor at cores, grows with the corpus, capped for the driver collect") {
    import graft.ext.Corpus
    // small corpus -> parallelism floor, not 1 giant bucket
    assert(Corpus.packBuckets(0L, 8) == 8)
    assert(Corpus.packBuckets(500L, 32) == 32)
    // big corpus -> ceil(nDocs / TargetDocsPerBucket), bounded per-task work
    assert(Corpus.packBuckets(100L * 1024 * 1024, 8) == 50)
    // astronomically big -> the 64k cap bounds the driver-side subtotal
    // collect (bounded-metadata discipline), never more
    assert(Corpus.packBuckets(1L << 42, 8) == Corpus.MaxPackBuckets)
    // past 2^52 docs the Long quotient exceeds Int.MaxValue — the clamp
    // must saturate at the cap, never wrap through toInt to `cores`
    assert(Corpus.packBuckets(1L << 60, 8) == Corpus.MaxPackBuckets)
    assert(Corpus.packBuckets(Long.MaxValue - 1, 8) == Corpus.MaxPackBuckets)
  }

  test("txt_pack_chunks on an empty documents table returns an empty frame, not an NPE") {
    // min/max aggregates are NULL on zero rows — the bounds read must
    // guard, and every downstream stage is empty-safe
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-docs").toString
    Tables.documents(spark, sf).limit(0).write.parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("txt_pack_chunks")(spark, tmp)
    assert(out.columns.toSeq ==
      Seq("chunk_id", "n_docs", "n_tokens", "first_doc", "last_doc"))
    assert(out.count() == 0)
  }

  test("txt_pack_chunks packs correctly under pathological id skew (all ids in one range bucket)") {
    // the range buckets carve the ID SPAN, so the per-bucket work bound
    // assumes roughly uniform ids; the in-code analysis (Corpus.scala)
    // claims clustering costs only parallelism, never correctness —
    // this pins that claim: stretch the span with one far outlier so
    // EVERY other doc lands in range-bucket 0, then require the packing
    // to equal the serial ground truth and stay bucket-count-invariant
    import spark.implicits._
    import graft.ext.TextExpr.toksE
    val tmp = java.nio.file.Files.createTempDirectory("graft-skew-docs").toString
    val docs = Tables.documents(spark, sf)
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    docs.withColumn("doc_id",
        when($"doc_id" === maxId, lit(10000000000L)).otherwise($"doc_id"))
      .write.parquet(s"$tmp/documents.parquet")
    def run(n: Int): Seq[(Long, Long, Long, Long, Long)] = {
      spark.conf.set("spark.graft.packBuckets", n.toString)
      try SparkEntry.queries("txt_pack_chunks")(spark, tmp)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      finally spark.conf.unset("spark.graft.packBuckets")
    }
    // serial ground truth: one cumulative offset pass in doc_id order
    val perDoc = spark.read.parquet(s"$tmp/documents.parquet")
      .withColumn("toks", expr(toksE))
      .select($"doc_id", size($"toks").cast("long").as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    var off = 0L
    val assigned = perDoc.map { case (id, n) =>
      val chunk = off / graft.ext.Corpus.SeqLen; off += n; (id, n, chunk)
    }
    val expected = assigned.groupBy(_._3).toSeq.sortBy(_._1).map { case (chunk, ds) =>
      (chunk, ds.length.toLong, ds.map(_._2).sum, ds.map(_._1).min, ds.map(_._1).max)
    }
    val got = run(1024)
    assert(got == expected,
      "skewed ids must pack exactly like the serial ground truth")
    assert(run(4096) == got,
      "bucket count stays a pure parallelism knob under skew")
  }

  test("txt_pack_chunks plans the prefix sum distributed: no single-partition exchange") {
    // the naive global-cumsum window would plan Exchange SinglePartition
    // (one task holds the corpus) — the two-phase formulation must not
    val plan = SparkEntry.queries("txt_pack_chunks")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"packing must not serialize onto one task:\n$plan")
  }
}
