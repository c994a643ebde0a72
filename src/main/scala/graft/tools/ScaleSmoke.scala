package graft.tools

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
  * corpus, not a bigger one.) Embedding copies are rotated (and
  * sign-flipped past 64 copies) for the same reason: a value-identical
  * copy is an exact cos=1 twin that lands in the same LSH bucket every
  * time, so a byte-copy would measure twin-flooding, not corpus growth;
  * rotation preserves norms and in-copy structure while cross-copy
  * vectors decorrelate. The exact pair-join family is O(n²) by declared
  * design, so it runs at a smaller K and the expectation there is ~K²
  * pair work with bounded per-task size (the auto-derived block count
  * absorbs the growth), not linearity.
  *
  * DECADES mode (round-15 verdict #2): the three banded/bucketed ops
  * whose 100 TB verdicts previously rested on plan shape plus a single
  * ×10 point run a second measured decade — ×1/×10/×100 — reporting
  * wall time AND candidate-pair count per decade, where the candidate
  * table comes from the SAME code path the registered query executes
  * (Dedup.minhashBands / Dedup.simhashBands /
  * Similarity.hyperplaneBuckets — no reimplementation that could
  * drift). Expectations: minhash/simhash candidates grow ~K (banding
  * is the whole point); hyperplane-LSH at FIXED 8 planes grows
  * ~K²/2^8 by construction — its scale knob is the plane count, so the
  * smoke also runs lshTopk with planes grown to 8 + ⌈log₂ K⌉
  * (8 → 12 → 15), which must bring candidates-per-vector back to ~flat.
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

    /** ×k corpus under /tmp (built once, reused across runs) — shared
      * construction, see ScaleCorpus. */
    def corpus(k: Int): String = ScaleCorpus.ensure(spark, sf, k)

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
    // sim_lsh_bucket_topk moved to the decades section below: with
    // rotated (non-twin) copies its candidate growth is the thing
    // being measured, at both fixed and log2-grown plane counts
    val quadratic = Seq("dedup_embedding_cosine")
    // warm-up covers the decade/sweep queries too — sim_lsh_bucket_topk
    // is no longer in the lists above, and without this its ×1 decade
    // point would carry first-touch JIT/codegen cost
    (linear ++ quadratic :+ "sim_lsh_bucket_topk").foreach(q =>
      try { SparkEntry.queries(q)(spark, warm).collect(); () }
      catch { case _: Throwable => () })
    Bench.isolate(spark)

    // `sweep-only` arg: skip straight to the shuffle-partition sweep
    // (warm-up above still runs — the sweep measures Spark, not JIT)
    val sweepOnly = args.contains("sweep-only")

    val runs =
      linear.flatMap(q => Seq((q, 1, "~K expected"), (q, 10, "~K expected"))) ++
      quadratic.flatMap(q => Seq((q, 1, "~K^2 pairs by design"), (q, 3, "~K^2 pairs by design")))
    if (!sweepOnly) runs.foreach { case (q, k, expect) =>
      val dir = corpus(k)
      val (sec, rows) = time(q, dir)
      println(f"""{"query":"$q","scale":$k,"sec":$sec%.2f,"rows":$rows,"expect":"$expect"}""")
    }

    // ---- DECADES: ×1/×10/×100 with candidate-pair counts (see scaladoc)
    // Terminal here is count(), not collect(): the near-dup PAIR mass of
    // the synthetic corpus is itself superlinear for simhash — the
    // corpus carries large template clusters (251 docs share one sketch
    // at sf0.1), so pair mass is cluster-quadratic and per-copy hash
    // redraws shift cluster boundaries (PLANS.md round 15) — so at ×100
    // the output is 10⁸+ rows; collecting that to a driver is not the
    // operator, a 100 TB dedup writes its pair set out. count() still
    // executes the banding, candidate join, verify filter and
    // pair-distinct; what it drops (EliminateSorts) is only the final
    // presentation ORDER BY.
    import graft.ext.{Dedup, Similarity}
    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.isolate(spark)
      (sec, a)
    }
    def timeCount(q: String, dir: String): (Double, Long) =
      timed(SparkEntry.queries(q)(spark, dir).count())
    // candidate pairs from the band table the query itself joins on:
    // distinct unordered (a,b) meeting in >=1 band — exactly the
    // query's `cand` set
    def bandCandidates(bands: org.apache.spark.sql.DataFrame, key: String): Long = {
      val l = bands.select(col("doc_id").as("a_id"), col("band"), col(key))
      val r = bands.select(col("doc_id").as("b_id"), col("band"), col(key))
      l.join(r, Seq("band", key)).filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct().count()
    }
    // bucket-LSH candidate pairs: sum over buckets of n·(n-1)/2
    // (coalesce: sum over ZERO groups is null, not 0)
    def bucketCandidates(buckets: org.apache.spark.sql.DataFrame): Long =
      buckets.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) / 2")), lit(0L)).cast("long"))
        .collect()(0).getLong(0)

    for (k <- Seq(1, 10, 100) if !sweepOnly) {
      val dir = corpus(k)
      for (q <- Seq("dedup_minhash_lsh", "dedup_simhash")) {
        val (csec, cand) = timed(q match {
          case "dedup_minhash_lsh" => bandCandidates(Dedup.minhashBands(spark, dir), "h")
          case _                   => bandCandidates(Dedup.simhashBands(spark, dir), "bv")
        })
        val (sec, rows) = timeCount(q, dir)
        println(f"""{"decade":"$q","scale":$k,"sec":$sec%.2f,"rows":$rows,"cand_pairs":$cand,"cand_sec":$csec%.2f,"expect":"~K candidates"}""")
      }
      // incremental delta pairs (dedup_pairs_incremental): candidate
      // generation probes NEW-doc bands (30 % of docs at the %10>=7
      // split) against the full band table instead of self-joining it,
      // so the candidate set and the verify scope carry only pairs
      // touching the delta (~1-0.7^2 = 51 % of pair mass here). The
      // in-query sig/band stage is still corpus-wide — a deployment
      // reads the PERSISTED signature index instead (the honest split
      // of the claim; see Dedup.minhashPairsDelta scaladoc) — so wall
      // lands between the delta share and the full run, while
      // cand_pairs must track the delta share exactly.
      {
        val (dcsec, dcand) = timed {
          val bands = Dedup.minhashBands(spark, dir)
          val l = bands.filter(pmod(col("doc_id"), lit(10)) >= 7)
            .select(col("doc_id").as("a_id"), col("band"), col("h"))
          val r = bands.select(col("doc_id").as("b_id"), col("band"), col("h"))
          l.join(r, Seq("band", "h")).filter(col("a_id") =!= col("b_id"))
            .select(least(col("a_id"), col("b_id")).as("x"),
              greatest(col("a_id"), col("b_id")).as("y"))
            .distinct().count()
        }
        val (dsec, drows) = timeCount("dedup_pairs_incremental", dir)
        println(f"""{"decade":"dedup_pairs_incremental","scale":$k,"sec":$dsec%.2f,"rows":$drows,"cand_pairs":$dcand,"cand_sec":$dcsec%.2f,"expect":"~K rows at the delta share; wall <= full pair gen"}""")
      }
      // fixed 8 planes: candidates ~K^2/256 by construction (the
      // honest record that fixed bits do NOT scale)...
      val (c8sec, cand8) = timed(bucketCandidates(Similarity.hyperplaneBuckets(spark, dir, 8)))
      val (sec8, rows8) = timed(Similarity.lshTopk(spark, dir, 8).count())
      println(f"""{"decade":"sim_lsh_bucket_topk","scale":$k,"planes":8,"sec":$sec8%.2f,"rows":$rows8,"cand_pairs":$cand8,"cand_sec":$c8sec%.2f,"expect":"~K^2/256 at fixed planes"}""")
      // ...and the documented scale knob: planes grown by log2 K holds
      // candidates-per-vector ~flat
      val planes = 8 + (math.log(k) / math.log(2)).ceil.toInt
      if (planes > 8) {
        val (cgsec, candG) = timed(bucketCandidates(Similarity.hyperplaneBuckets(spark, dir, planes)))
        val (secG, rowsG) = timed(Similarity.lshTopk(spark, dir, planes).count())
        println(f"""{"decade":"sim_lsh_bucket_topk","scale":$k,"planes":$planes,"sec":$secG%.2f,"rows":$rowsG,"cand_pairs":$candG,"cand_sec":$cgsec%.2f,"expect":"~K candidates at log2-grown planes"}""")
      }
    }

    // ---- shuffle-partition sweep at ×100: local[32] pins
    // spark.sql.shuffle.partitions at 32, so at 100× the data each
    // shuffle partition carries ~100× the ×1 bytes and the heavy
    // minhash verify join starts to spill — a fixed-partition artifact
    // a real cluster does not have (partition counts are sized with
    // the data there). Measure the same ×100 query at 32/128/512
    // initial partitions to separate "operator scales" from "local
    // harness under-partitions".
    // Single reps swing ±50 % on ~minute-long entries (same lesson the
    // bench learned in round 13), so the sweep runs 3 INTERLEAVED
    // passes (32,128,512, 32,128,512, …) and reports the min per
    // setting — a host-contention window hits each setting at most
    // once.
    val dir100 = corpus(100)
    val sweepPs = Seq(32, 128, 512)
    val sweepBest = scala.collection.mutable.Map[Int, (Double, Long)]()
    for (_ <- 1 to 3; p <- sweepPs) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val (sec, rows) = timeCount("dedup_minhash_lsh", dir100)
      val prev = sweepBest.get(p)
      if (prev.forall(_._1 > sec)) sweepBest(p) = (sec, rows)
    }
    for (p <- sweepPs) {
      val (sec, rows) = sweepBest(p)
      println(f"""{"sweep":"dedup_minhash_lsh","scale":100,"shuffle_partitions":$p,"min_of_3_sec":$sec%.2f,"rows":$rows}""")
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.stop()
  }
}
