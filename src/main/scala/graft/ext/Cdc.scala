package graft.ext

import java.nio.file.{Files, Paths}

import graft.{QueryDef, Tables}
import graft.etl.MergeWriter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Content-defined chunking (CDC) — the dedup-STORAGE primitive: chunk
  * boundaries are placed where a rolling hash of the last W characters
  * hits a divisor condition, so boundaries stick to CONTENT, not
  * offsets. Insert one character near the front of a document and
  * fixed-size chunking reshuffles every subsequent chunk; CDC re-syncs
  * after ~one window and every later chunk keeps its identity (and its
  * md5) — which is what makes chunk-level dedup across near-identical
  * documents work (Muthitacharoen et al., "A Low-Bandwidth Network
  * File System", SOSP 2001 — the LBFS scheme; FastCDC is the modern
  * gear-hash descendant).
  *
  * Scheme here (deliberately the minimal exact-replayable variant):
  * window W=16 chars over the whitespace-normalized text, window hash
  * H(s) = the corpus's Rabin-Karp fold (acc·31 + c mod 2³¹−1 — the
  * exact-integer txt_rolling_hash machinery), cut after position i
  * when H(norm[i−15..i]) ≡ 0 (mod 64) → expected chunk ≈ 64 chars.
  * No min/max chunk bounds: every position is judged independently,
  * which keeps the DuckDB twin an exact lambda replay (a min-size rule
  * makes cut selection stateful; FastCDC needs it only to bound
  * metadata overhead, not for correctness).
  *
  * Scale: the boundary scan is a per-row lambda (O(W·len) integer ops,
  * no shuffle); the explode is the mm_frame_sample 1→n shape; the
  * dedup profile is one hash-agg on a 16-byte md5 key — the same
  * single-shuffle bound as dedup_exact.
  *
  * Reference basis: none (the reference has no corpus ops); this is
  * the extended LLM-pipeline surface (builder brief).
  */
object Cdc {

  /** Spark-side cut positions: i ∈ [W, len−1] (1-based char positions;
    * len excluded so the tail boundary never duplicates), kept when
    * the window hash mod 64 is 0. Descending-sequence guard: documents
    * shorter than W+1 produce no cuts.
    *
    * This HOF formulation is the INTERPRETED TWIN, kept for
    * CdcCutsSpec's bit-for-bit equivalence gate: the registered
    * entries route the scan through the native `cdc_cuts` expression
    * ([[graft.functions.CdcCuts]] — r21: true O(1) rolling recurrence
    * inside whole-stage codegen, replacing this O(W)-per-position
    * CodegenFallback re-fold; the token_stats move applied to the CDC
    * family). Both produce identical cut arrays, so the DuckDB oracle
    * (an exact lambda replay of THIS formulation) is unchanged. */
  private[graft] val cutsHofTwinE =
    """CASE WHEN length(norm) >= 17 THEN
         filter(sequence(16, length(norm) - 1), i ->
           aggregate(transform(split(substr(norm, i - 15, 16), ''), c -> ascii(c)),
             0L, (acc, x) -> (acc * 31 + x) % 2147483647) % 64 = 0)
       ELSE CAST(array() AS array<int>) END"""

  /** (doc_id, chunk_idx, chunk_len, chunk_md5) for every chunk of every
    * non-empty document — the shared body of both entries. Takes any
    * (doc_id, text) frame so the spec can drive crafted documents. */
  private[graft] def chunkDf(docs: org.apache.spark.sql.DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    graft.functions.CdcCuts.register(s)
    docs
      .withColumn("norm", regexp_replace(lower(trim($"text")), "\\s+", " "))
      .filter(length($"norm") > 0)
      .withColumn("cuts", expr("cdc_cuts(norm)"))
      .withColumn("b", expr("concat(array(0), cuts, array(length(norm)))"))
      .select($"doc_id", $"norm", explode(expr(
        """transform(sequence(1, size(b) - 1), j ->
             struct(j - 1 AS idx, element_at(b, j) AS st,
                    element_at(b, j + 1) - element_at(b, j) AS ln))""")).as("ch"))
      .select($"doc_id", $"ch.idx".as("chunk_idx"), $"ch.ln".as("chunk_len"),
        md5(expr("substr(norm, ch.st + 1, ch.ln)")).as("chunk_md5"))
  }

  private def chunks(s: org.apache.spark.sql.SparkSession, dir: String) =
    chunkDf(Tables.documents(s, dir))

  /** DuckDB twin of the chunk derivation (1-based lists; range() is
    * end-exclusive, so range(16, strlen) ≡ sequence(16, len−1)).
    * CTE names carry prefix `p` so two generations' chains can share
    * one WITH (the incremental entry); `src` is the doc source CTE. */
  private def chunksSqlAt(p: String, src: String): String = s"""
        ${p}t AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
              FROM $src),
        ${p}t2 AS (SELECT doc_id, norm,
                      CASE WHEN strlen(norm) >= 17 THEN
                        list_filter(range(16, strlen(norm)), i ->
                          list_reduce(
                            list_prepend(0::BIGINT,
                              list_transform(string_split(substr(norm, i - 15, 16), ''), c -> ascii(c)::BIGINT)),
                            (acc, x) -> (acc * 31 + x) % 2147483647) % 64 = 0)
                      ELSE [] END AS cuts
               FROM ${p}t WHERE strlen(norm) > 0),
        ${p}b AS (SELECT doc_id, norm,
                     list_concat(list_concat([0], cuts), [strlen(norm)]) AS bnd
              FROM ${p}t2),
        ${p}ch AS (SELECT doc_id, norm,
                      unnest(list_transform(range(1, len(bnd)), j ->
                        {'idx': j - 1, 'st': bnd[j], 'ln': bnd[j + 1] - bnd[j]})) AS c
               FROM ${p}b),
        ${p}chunk AS (SELECT doc_id, c.idx AS chunk_idx, c.ln AS chunk_len,
                         md5(substr(norm, c.st + 1, c.ln)) AS chunk_md5
                  FROM ${p}ch)"""

  private val chunksSql = chunksSqlAt("", "documents")

  // ---- persisted chunk store: the content-addressed store a CDC
  // deployment actually probes. dedup_cdc_incremental recomputes the
  // old generation's chunks in-plan (its oracle-equivalence role);
  // here the store is committed ONCE through the real MergeWriter path
  // (the dedup_clusters_persisted / sim_ivf_index_build storage-truth
  // discipline) and the probe reads the COMMITTED snapshot.

  private[graft] val chunkStoreSchema: StructType = StructType(Seq(
    StructField("chunk_md5", StringType),
    StructField("chunk_len", LongType)))

  private val builtStore = scala.collection.mutable.Set[String]()

  /** Store root keyed by sfDir + the corpus content fingerprint —
    * the shared [[StoreRoot]] helper (memoized per JVM, ADVICE r20
    * items 2/4: the probe entry no longer pays a corpus scan per
    * invocation just to re-derive a root it already knows). */
  private def storeRoot(s: org.apache.spark.sql.SparkSession, dir: String): String =
    StoreRoot.resolve(s, dir, "GRAFT_CDC_STORE_DIR", "cdc-store",
      Tables.documents, "doc_id", "text")

  /** Build-once (_DONE-cached per corpus fingerprint) chunk-store
    * commit: distinct (chunk_md5, chunk_len) through MergeWriter,
    * bucketed on the md5 key. Returns the committed table dir. */
  private[graft] def materializeChunkStore(s: org.apache.spark.sql.SparkSession, dir: String): String = synchronized {
    val root = storeRoot(s, dir)
    val cdir = s"$root/chunks"
    if (!builtStore.contains(root)) {
      val done = Paths.get(root, "_DONE")
      if (!Files.exists(done)) {
        Embeddings.deleteRecursively(Paths.get(root))
        Files.createDirectories(Paths.get(cdir))
        val store = chunks(s, dir)
          .groupBy(col("chunk_md5"))
          .agg(max(col("chunk_len")).cast("long").as("chunk_len"))
        MergeWriter.merge(s, cdir, store,
          keys = Seq("chunk_md5"), orderBy = Seq("chunk_len"),
          bucket = Some(MergeWriter.BucketSpec("chunk_md5", 16)))
        Files.createFile(done)
        ()
      }
      builtStore += root
    }
    cdir
  }

  /** Shared incremental-probe oracle: re-derives BOTH generations'
    * chunk tables and the store from scratch — gates the in-plan
    * recompute (`dedup_cdc_incremental`) AND the committed-snapshot
    * read (`dedup_cdc_persisted`), so store-commit ≡ recompute is
    * hash-proven per round (the sim_ivfpq same-oracle discipline). */
  private def cdcIncrementalOracle: String = s"""
        WITH $chunksSql,
        docs2 AS (SELECT doc_id, 'edit ' || text AS text FROM documents),
        ${chunksSqlAt("n", "docs2")},
        store AS (SELECT DISTINCT chunk_md5 FROM chunk)
        SELECT nc.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN s.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reused,
               CAST(sum(nc.chunk_len) AS BIGINT) AS bytes_total,
               CAST(sum(CASE WHEN s.chunk_md5 IS NULL THEN nc.chunk_len ELSE 0 END) AS BIGINT) AS bytes_new,
               round(CAST(sum(CASE WHEN s.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS reuse_ratio
        FROM nchunk nc LEFT JOIN store s USING (chunk_md5)
        GROUP BY 1"""

  /** The probe aggregation both incremental entries share: the edited
    * generation's chunks left-joined against a store keyed on
    * chunk_md5, aggregated per doc. */
  private def probeAgainst(store: org.apache.spark.sql.DataFrame,
      dir: String): org.apache.spark.sql.DataFrame = {
    val s = store.sparkSession
    import s.implicits._
    val edited = Tables.documents(s, dir)
      .select($"doc_id", concat(lit("edit "), $"text").as("text"))
    chunkDf(edited)
      .join(store.select($"chunk_md5").withColumn("hit", lit(1)), Seq("chunk_md5"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce($"hit", lit(0))).cast("long").as("n_reused"),
        sum($"chunk_len").cast("long").as("bytes_total"),
        sum(when($"hit".isNull, $"chunk_len").otherwise(0)).cast("long").as("bytes_new"))
      .select($"doc_id", $"n_chunks", $"n_reused", $"bytes_total", $"bytes_new",
        round($"n_reused".cast("double") / $"n_chunks", 4).as("reuse_ratio"))
  }

  val defs: Map[String, QueryDef] = Map(
    // the chunk table itself: every (doc, chunk) with its
    // content-defined boundary, length, and fingerprint
    "txt_cdc_chunks" -> QueryDef(
      build = (s, dir) => chunks(s, dir),
      oracle = Some(s"""
        WITH $chunksSql
        SELECT doc_id, chunk_idx, chunk_len, chunk_md5 FROM chunk"""),
      doc = "content-defined chunking (LBFS/FastCDC family): W=16 Rabin window, cut on hash≡0 mod 64 — boundaries stick to content so edits stay local; per-chunk md5 hash-gated"),

    // chunk-level dedup profile: the storage-dedup headline numbers —
    // how many chunk occurrences collapse onto shared fingerprints,
    // and the byte ratio a chunk store would save. Exact longs
    // throughout; the one ratio divides exact operands once.
    "dedup_cdc_profile" -> QueryDef(
      build = (s, dir) => {
        val sp = s
        import sp.implicits._
        chunks(s, dir)
          .groupBy($"chunk_md5")
          .agg(count(lit(1)).as("cnt"), max($"chunk_len").as("len"))
          .agg(
            sum($"cnt").as("n_chunks"),
            count(lit(1)).as("n_distinct_chunks"),
            sum(when($"cnt" > 1, $"cnt").otherwise(0L)).as("dup_occurrences"),
            sum($"cnt" * $"len").as("bytes_total"),
            sum($"len").as("bytes_unique"))
          .select($"n_chunks", $"n_distinct_chunks", $"dup_occurrences",
            $"bytes_total", $"bytes_unique",
            round(lit(1.0) - $"bytes_unique".cast("double") / $"bytes_total".cast("double"), 4)
              .as("dedup_ratio"))
      },
      oracle = Some(s"""
        WITH $chunksSql,
        g AS (SELECT chunk_md5, CAST(count(*) AS BIGINT) AS cnt,
                     max(chunk_len) AS len
              FROM chunk GROUP BY 1)
        SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
               CAST(count(*) AS BIGINT) AS n_distinct_chunks,
               CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_occurrences,
               CAST(sum(cnt * len) AS BIGINT) AS bytes_total,
               CAST(sum(len) AS BIGINT) AS bytes_unique,
               round(1.0 - CAST(sum(len) AS DOUBLE) / CAST(sum(cnt * len) AS DOUBLE), 4) AS dedup_ratio
        FROM g"""),
      doc = "chunk-store dedup profile over the CDC chunk table: occurrence/byte savings a content-addressed store realizes on this corpus — exact longs, one hash-agg on the md5 key (the dedup_exact shuffle bound)"),

    // the INCREMENTAL read — the actual LBFS deployment story: a new
    // generation (every document front-edited with a 5-char prefix,
    // the adversarial case for offset-based chunking) is chunked and
    // its fingerprints probed against the previous generation's chunk
    // store. Because boundaries stick to content, the window re-syncs
    // after the edit and every later chunk keeps its md5 — CdcSpec
    // proves the law on one crafted pair; this entry hash-gates the
    // CORPUS-WIDE consequence (mean per-doc chunk reuse 0.71, byte
    // reuse 0.73 at sf0.01 — i.e. a 1-char-class edit re-ships ~27% of
    // bytes instead of ~100% under fixed-offset chunking). Plan: both
    // generations' chunk scans are per-row lambdas; the store probe is
    // one equi-join on the 16-byte md5 (left join so novel chunks
    // survive), aggregated per doc — nothing here exceeds the
    // dedup_exact shuffle bound.
    "dedup_cdc_incremental" -> QueryDef(
      build = (s, dir) => {
        val sp = s
        import sp.implicits._
        probeAgainst(chunks(s, dir).select($"chunk_md5").distinct(), dir)
      },
      oracle = Some(cdcIncrementalOracle),
      doc = "incremental CDC ingest: the front-edited generation's chunks probed against the old generation's chunk set — content-defined boundaries re-sync after the edit, so per-doc chunk reuse averages 0.71 (byte reuse 0.73) where offset chunking would reuse ~0; one md5 equi-join, per-doc aggregation; the committed-store read is dedup_cdc_persisted"),

    // the same probe over the COMMITTED content-addressed store — the
    // read that survives deployment: the store lands ONCE through the
    // real MergeWriter path (versioned segment + atomic pointer swap,
    // md5-bucketed) and every later generation only probes the
    // snapshot. SAME oracle as dedup_cdc_incremental, so committed-
    // store-read ≡ in-plan recompute is hash-proven per round.
    "dedup_cdc_persisted" -> QueryDef(
      build = (s, dir) => {
        val cdir = materializeChunkStore(s, dir)
        probeAgainst(MergeWriter.readSnapshot(s, cdir, chunkStoreSchema), dir)
      },
      oracle = Some(cdcIncrementalOracle),
      doc = "persisted CDC store probe: the edited generation probed against the chunk store COMMITTED through MergeWriter (build-once, md5-bucketed, fingerprint-keyed root) — same oracle as dedup_cdc_incremental so snapshot-read ≡ recompute is hash-proven per round; the storage-truth shape of the incremental ingest")
  )
}
