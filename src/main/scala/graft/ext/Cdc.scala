package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

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
    * shorter than W+1 produce no cuts. */
  private val cutsE =
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
    docs
      .withColumn("norm", regexp_replace(lower(trim($"text")), "\\s+", " "))
      .filter(length($"norm") > 0)
      .withColumn("cuts", expr(cutsE))
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
    * end-exclusive, so range(16, strlen) ≡ sequence(16, len−1)). */
  private val chunksSql = """
        t AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
              FROM documents),
        t2 AS (SELECT doc_id, norm,
                      CASE WHEN strlen(norm) >= 17 THEN
                        list_filter(range(16, strlen(norm)), i ->
                          list_reduce(
                            list_prepend(0::BIGINT,
                              list_transform(string_split(substr(norm, i - 15, 16), ''), c -> ascii(c)::BIGINT)),
                            (acc, x) -> (acc * 31 + x) % 2147483647) % 64 = 0)
                      ELSE [] END AS cuts
               FROM t WHERE strlen(norm) > 0),
        b AS (SELECT doc_id, norm,
                     list_concat(list_concat([0], cuts), [strlen(norm)]) AS bnd
              FROM t2),
        ch AS (SELECT doc_id, norm,
                      unnest(list_transform(range(1, len(bnd)), j ->
                        {'idx': j - 1, 'st': bnd[j], 'ln': bnd[j + 1] - bnd[j]})) AS c
               FROM b),
        chunk AS (SELECT doc_id, c.idx AS chunk_idx, c.ln AS chunk_len,
                         md5(substr(norm, c.st + 1, c.ln)) AS chunk_md5
                  FROM ch)"""

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
      doc = "chunk-store dedup profile over the CDC chunk table: occurrence/byte savings a content-addressed store realizes on this corpus — exact longs, one hash-agg on the md5 key (the dedup_exact shuffle bound)")
  )
}
