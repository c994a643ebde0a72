package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-organization operators — the steps between a cleaned document
  * set and a training run: deterministic split assignment (sampling /
  * sharding) and sequence packing. Both are pure functions of the data
  * (hash- and id-driven, no RNG), so re-running a 100 TB pipeline
  * reproduces byte-identical shards — the property that makes ablations
  * and resumed runs comparable.
  */
object Corpus {

  import TextExpr.toksE

  /** Tokens per packed sequence for [[txt_pack_chunks]]. */
  val SeqLen = 2048

  /** Derived range-bucket count for the distributed prefix sum —
    * sized from the corpus, not a constant (a fixed count means
    * per-bucket window size grows linearly with the corpus): enough
    * buckets that each holds ≤ [[TargetDocsPerBucket]] docs (bounded
    * per-task window work at any scale), at least the cluster's cores
    * (the window stage stays parallel on small corpora), capped at
    * [[MaxPackBuckets]] so the driver-side subtotal collect stays
    * metadata-sized (≤64k rows — the same bounded-collect discipline
    * as the merge planner and auto-`cosineBlocks`, Dedup.scala).
    * 64k buckets × 2M docs/bucket ≈ 128G docs before the cap binds.
    * The packing is bucket-count-invariant by construction
    * (CorpusSpec pins it at {256, 1024, 4096}). */
  val TargetDocsPerBucket: Long = 2L * 1024 * 1024
  val MaxPackBuckets: Int = 65536

  /** The 80/10/10 split assignment of `txt_hash_split`, as a column
    * over `doc_id` — ONE definition shared by the split entry and the
    * end-to-end pipeline ([[Pipe]]), so the two cannot drift. */
  private[ext] def splitCol: Column = {
    val bucket = expr(
      "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 100")
    when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
  }

  /** Chunk assignment for sequence packing, generalized per split:
    * `docs` carries (split, doc_id, n_tokens); within each split the
    * documents are laid out in doc_id order and cut into [[SeqLen]]-token
    * chunks, each doc assigned to the chunk its start offset falls in.
    * Returns docs + (chunk_id). The global offsets are the distributed
    * two-phase prefix sum described on `txt_pack_chunks` (range-bucketed
    * on doc_id, driver-side subtotal collect bounded by
    * [[MaxPackBuckets]] × splits, per-(split,bucket) windows — no
    * single-task window at any scale); with a single constant split it
    * reduces exactly to the original single-stream packing.
    *
    * The machinery is COUNT-AGNOSTIC: callers supply `n_tokens`, and
    * the registered entries feed the whitespace tokenizer for oracle
    * simplicity. A production budget would feed real tokenizer output —
    * `txt_bpe_encode`'s per-doc n_tokens (the greedy merge-table BPE,
    * [[Bpe]]) is the drop-in swap: replace the n_tokens projection, no
    * packing change. */
  private[ext] def packAssign(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val bounds = docs.agg(min($"doc_id").as("mn"), max($"doc_id").as("mx"),
      count(lit(1)).as("n")).head()
    val (mn, nDocs) =
      if (bounds.isNullAt(0)) (0L, 0L)
      else (bounds.getLong(0), bounds.getLong(2))
    val buckets = s.conf.getOption("spark.graft.packBuckets").map(_.toInt)
      .getOrElse(packBuckets(nDocs, s.sparkContext.defaultParallelism))
    val span = if (nDocs == 0) 1L else bounds.getLong(1) - mn + 1
    val width = math.max(1L, (span + buckets - 1) / buckets)
    val withB = docs.withColumn("pbucket", expr(s"(doc_id - $mn) DIV $width"))
    // per-(split,bucket) subtotals -> cumulative start offset per bucket
    // WITHIN its split (driver state stays ≤ splits × bucket-count rows)
    val subtotals = withB.groupBy($"split", $"pbucket")
      .agg(sum($"n_tokens").as("bt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val offsets = subtotals.toSeq.flatMap { case (split, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (b, off) => (split, b, off) }
    }
    val offDf = offsets.toDF("split", "pbucket", "bucket_off")
    val w = Window.partitionBy($"split", $"pbucket").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offDf), Seq("split", "pbucket"))
      .withColumn("start_off",
        $"bucket_off" + coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"start_off DIV $SeqLen"))
      .select($"split", $"doc_id", $"n_tokens", $"chunk_id")
  }

  def packBuckets(nDocs: Long, cores: Int): Int = {
    // overflow-free ceiling division, then clamp on the Long BEFORE
    // narrowing: the additive form (nDocs + Target - 1) wraps negative
    // for nDocs near Long.MaxValue, and for nDocs ≳ 2^52 the quotient
    // exceeds Int.MaxValue so a bare .toInt would wrap — either way the
    // result would collapse to `cores` instead of the 64k cap
    val ceilDiv =
      nDocs / TargetDocsPerBucket + (if (nDocs % TargetDocsPerBucket == 0) 0 else 1)
    val byWork = math.min(MaxPackBuckets.toLong, ceilDiv).toInt
    math.min(MaxPackBuckets, math.max(math.max(1, cores), byWork))
  }

  val defs: Map[String, QueryDef] = Map(
    // ---- deterministic train/validation/test assignment: bucket each
    // doc by a hash of its id (md5 — bit-identical in Spark and DuckDB)
    // and carve 80/10/10. Hash-based assignment is the scalable form of
    // "random split": shuffle-free, stable under corpus growth (a doc
    // never migrates between splits when new docs arrive), and exactly
    // reproducible across engines — TABLESAMPLE/rand() are neither.
    "txt_hash_split" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .withColumn("toks", expr(toksE))
          .withColumn("split", splitCol)
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            sum(size($"toks").cast("long")).as("n_tokens"),
            min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      },
      oracle = Some("""
        WITH t AS (SELECT doc_id,
                          len(string_split_regex(trim(text), '\s+')) AS n,
                          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 AS bucket
                   FROM documents)
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'validation'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM t GROUP BY 1"""),
      doc = "deterministic 80/10/10 split assignment via id-hash buckets (shuffle-free, engine-reproducible)"),

    // ---- sequence packing, concat-then-chunk: documents are laid out
    // end to end in doc_id order and cut into SeqLen-token chunks; each
    // doc is assigned to the chunk its START offset falls in. The
    // offsets are a GLOBAL prefix sum — the naive formulation is a
    // window over one unpartitioned ORDER BY, i.e. a single task
    // holding the whole corpus, the exact shape the suite's plan
    // standards exist to prevent. Implemented as the classic
    // distributed prefix sum instead: docs are range-bucketed on
    // doc_id (bucket count DERIVED from corpus size — see packBuckets —
    // so both the driver collect and the per-bucket window stay
    // bounded), per-bucket token subtotals are collected driver-side
    // (≤ bucket-count rows — the same bounded-metadata pattern as the
    // merge planner's touched-bucket collect), cumulative bucket
    // offsets broadcast back, and the within-bucket window runs
    // partitioned — every stage parallel, no global sort, no
    // single-task window.
    "txt_pack_chunks" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        // range buckets: count derived from corpus size (packBuckets;
        // spark.graft.packBuckets overrides for the invariance spec) so
        // driver state stays metadata-scale AND per-bucket window work
        // stays bounded as the corpus grows. Buckets carve the ID RANGE
        // (contiguity in doc_id order is what makes the two-phase
        // prefix sum exact), so the per-bucket bound assumes ids are
        // roughly uniform over [min, max] — true for sequential or
        // hash-assigned ids; pathological clustering degrades only
        // parallelism (one fat bucket), never correctness, and the
        // packing stays bucket-count-invariant either way. The prefix
        // sum itself lives in [[packAssign]] (shared with the pipeline
        // entry); with this single constant split it reduces exactly to
        // the original single-stream packing.
        val docs = Tables.documents(s, dir)
          .withColumn("toks", expr(toksE))
          .select(lit("all").as("split"),
            $"doc_id", size($"toks").cast("long").as("n_tokens"))
        packAssign(s, docs)
          .groupBy($"chunk_id")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"),
            min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      },
      oracle = Some(s"""
        WITH t AS (SELECT doc_id,
                          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
                   FROM documents),
        c AS (SELECT doc_id, n,
                     COALESCE(sum(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS so
              FROM t)
        -- CAST: so is a windowed sum, which DuckDB promotes to HUGEINT;
        -- uncast, chunk_id would be HUGEINT vs Spark's BIGINT and fail
        -- the driver's type-sensitive hash despite identical values
        SELECT CAST(so // $SeqLen AS BIGINT) AS chunk_id,
               count(*) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM c GROUP BY 1"""),
      doc = s"sequence packing (concat-then-chunk, $SeqLen tokens): global token offsets via distributed two-phase prefix sum, no single-task window"),

    // ---- deterministic stratified sampling — the data-MIXING step: each
    // source keeps a per-source rate (here rate = f(source number mod 4):
    // 1.0 / 0.6 / 0.3 / 0.1 — the upsample/downsample table a pipeline
    // tunes per domain), decided per doc by a SALTED id hash
    // ('mix|' prefix — deliberately decorrelated from txt_hash_split's
    // unsalted bucket, so sampling never biases which train/val/test
    // cell survives). Same determinism argument as the split: shuffle-
    // free, reproducible across engines and reruns, stable under corpus
    // growth — rand()/TABLESAMPLE are none of these.
    "txt_sample_stratified" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .withColumn("mix_bucket", expr(
            "CAST(conv(substr(md5(concat('mix|', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS INT) % 10000"))
          .withColumn("rate_bp", // basis points, exact integers
            element_at(array(lit(10000), lit(6000), lit(3000), lit(1000)),
              pmod(substring($"source", 4, 10).cast("int"), lit(4)) + 1))
          .filter($"mix_bucket" < $"rate_bp")
          .select($"doc_id", $"source", $"mix_bucket", $"rate_bp")
      },
      oracle = Some("""
        WITH m AS (SELECT doc_id, source,
                          ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10000 AS mix_bucket,
                          [10000, 6000, 3000, 1000][(CAST(substr(source, 4) AS INT) % 4) + 1] AS rate_bp
                   FROM documents)
        SELECT doc_id, source, mix_bucket, rate_bp
        FROM m WHERE mix_bucket < rate_bp"""),
      doc = "stratified sampling: per-source keep rates via salted id-hash thresholds — deterministic data mixing, shuffle-free")
  )
}
