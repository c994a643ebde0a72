package graft.ext

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-pipeline operators beyond similarity SEARCH: clustering
  * (k-means), compression (int8 scalar quantization), and semantic
  * deduplication (SemDeDup-style within-cell near-dup marking).
  *
  * Determinism design (the property every oracle-gated entry here
  * rides on): any aggregation ACROSS rows runs on fixed-point
  * integers — `round(x·10⁴)` as long — so partial-aggregate order
  * cannot change the result (long sums are associative/commutative;
  * double sums are not). Per-ROW reductions (distances, dot products)
  * stay floating point but are sequential left-folds in array order,
  * which both engines reproduce bit-for-bit (the sim_l2_normalize
  * precedent). See PLANS.md for the scale notes per operator.
  *
  * Reference basis: the reference has no vector ops (SURVEY §2.6);
  * these implement the extended LLM-pipeline surface (builder brief).
  */
object Embeddings {

  /** Quantized embedding: `qv[i] = round(v[i]·10⁴)` as long — the
    * exact-sum representation every cross-row aggregate uses. */
  private val qvE = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))"

  /** Per-cell centroids of the quantized vectors, one row per cell:
    * (label, cv: array<double>). Sum-of-longs per (cell, dim) is
    * exact, so the division is performed once on exact operands —
    * both engines compute the identical double. */
  def centroids(vecs: DataFrame): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    vecs.select($"label", posexplode(expr(qvE)).as(Seq("pos", "q")))
      .groupBy($"label", $"pos")
      .agg(sum($"q").as("sq"), count(lit(1)).as("cnt"))
      .select($"label", $"pos",
        ($"sq".cast("double") / (lit(10000.0) * $"cnt")).as("c"))
      .groupBy($"label")
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), s -> s.c)").as("cv"))
  }

  /** One Lloyd ASSIGN step: each vector moves to the nearest centroid
    * by squared L2 (sequential-fold, ties broken by lowest cell id).
    * `cells` is small (k rows) → broadcast; the big side never
    * shuffles. Returns (vec_id, label, assigned, d2). */
  def assign(vecs: DataFrame, cells: DataFrame): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"vec_id").orderBy($"d2".asc, $"c_label".asc)
    vecs.select($"vec_id", $"label", expr(s"transform($qvE, q -> q / 10000.0)").as("vd"))
      .crossJoin(broadcast(cells.select($"label".as("c_label"), $"cv")))
      .select($"vec_id", $"label", $"c_label",
        round(expr("aggregate(zip_with(vd, cv, (a, b) -> (a - b) * (a - b)), 0.0d, (acc, x) -> acc + x)"), 6).as("d2"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"label", $"c_label".as("assigned"), $"d2")
  }

  /** Full Lloyd's iteration (spec-exercised; the registered query is
    * one step so the oracle stays SQL-expressible): k cells seeded
    * from the current `label` column, then `rounds` update+assign
    * passes. Deterministic: every centroid update is the exact
    * quantized mean. Each round's assignment is localCheckpointed —
    * the lineage would otherwise double per round (the iterative-
    * algorithm discipline of Cluster.cc*). */
  def kmeans(vecs: DataFrame, rounds: Int): DataFrame = {
    var cur = vecs.select("vec_id", "label", "embedding").localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val next = assign(cur, centroids(cur))
        .select(col("vec_id"), col("assigned").as("label"))
        .join(vecs.select("vec_id", "embedding"), "vec_id")
        .select("vec_id", "label", "embedding")
        .localCheckpoint(true)
      cur = next
      r += 1
    }
    cur.select("vec_id", "label")
  }

  /** DuckDB sequential left-fold with explicit 0.0 init — matches
    * Spark's `aggregate(arr, 0.0d, +)` exactly. */
  private def foldSql(arr: String): String =
    s"list_reduce(list_prepend(0.0, $arr), (a, b) -> a + b)"

  val defs: Map[String, QueryDef] = Map(
    // --- one k-means Lloyd step over the label partition: centroid
    // update (exact quantized mean per cell) + nearest reassignment.
    // Per-round plan: one (cell, dim)-grouped shuffle of |v|·64 longs
    // for centroids, then a broadcast of k·64 doubles against the
    // vector scan — the big side never shuffles, which is the property
    // that survives a 100 TB corpus. Window is per-vec_id over k rows.
    "sim_kmeans_assign" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.embeddings(s, dir)
        assign(e, centroids(e))
      },
      oracle = Some(s"""
        WITH q AS (SELECT vec_id, label,
                          list_transform(embedding::DOUBLE[], x -> CAST(round(x * 10000.0) AS BIGINT)) AS qv
                   FROM embeddings),
        cd AS (SELECT label, i, CAST(sum(qv[i]) AS DOUBLE) / (10000.0 * count(*)) AS c
               FROM q, generate_series(1, 64) t(i) GROUP BY 1, 2),
        cent AS (SELECT label AS c_label, list(c ORDER BY i) AS cv FROM cd GROUP BY 1),
        d AS (SELECT q.vec_id, q.label, cent.c_label,
                     round(${foldSql("list_transform(list_zip(list_transform(qv, x -> x / 10000.0), cv), p -> (p[1] - p[2]) * (p[1] - p[2]))")}, 6) AS d2
              FROM q CROSS JOIN cent)
        SELECT vec_id, label, c_label AS assigned, d2
        FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_label ASC) = 1"""),
      doc = "k-means Lloyd step: exact quantized centroid update + broadcast nearest-cell assign"),

    // --- int8 scalar quantization (the embedding-compression pass a
    // 100 TB vector store runs before indexing): per-vector absmax
    // scale, q = round(127·x/scale), plus the fidelity audit — exact
    // vs dequantized cosine against the corpus query vector (vec 0).
    // Shuffle-free scan + 1-row broadcast panel.
    "sim_quantize_int8" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        VectorFunctions.register(s)
        val e = Tables.embeddings(s, dir)
          .withColumn("scale", expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
          .withColumn("q", expr("transform(embedding, x -> CAST(round(127.0 * CAST(x AS DOUBLE) / scale) AS INT))"))
          .withColumn("dq", expr("transform(q, i -> CAST(i AS DOUBLE) * scale / 127.0)"))
        val q0 = e.filter($"vec_id" === 0)
          .select($"embedding".as("v0"), $"dq".as("dq0"))
        e.filter($"vec_id" =!= 0).crossJoin(broadcast(q0))
          .select($"vec_id", round($"scale", 6).as("scale"),
            element_at($"q", 1).as("q_first"), element_at($"q", 64).as("q_last"),
            round(expr("cosine_sim(embedding, v0)"), 4).as("cos_exact"),
            round(expr("cosine_sim(dq, dq0)"), 4).as("cos_int8"),
            round(abs(expr("cosine_sim(embedding, v0)") - expr("cosine_sim(dq, dq0)")), 4).as("cos_err"))
      },
      oracle = Some {
        val dot = (a: String, b: String) => foldSql(s"list_transform(list_zip($a, $b), x -> x[1] * x[2])")
        val cos = (a: String, b: String) => s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
        s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        qz AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS scale,
                      list_transform(v, x -> CAST(round(127.0 * x / list_max(list_transform(v, y -> abs(y)))) AS INT)) AS q
               FROM e),
        dq AS (SELECT vec_id, v, scale, q,
                      list_transform(q, i -> CAST(i AS DOUBLE) * scale / 127.0) AS d
               FROM qz),
        q0 AS (SELECT v AS v0, d AS dq0 FROM dq WHERE vec_id = 0)
        SELECT a.vec_id, round(a.scale, 6) AS scale,
               a.q[1] AS q_first, a.q[64] AS q_last,
               round(${cos("a.v", "q0.v0")}, 4) AS cos_exact,
               round(${cos("a.d", "q0.dq0")}, 4) AS cos_int8,
               round(abs(${cos("a.v", "q0.v0")} - ${cos("a.d", "q0.dq0")}), 4) AS cos_err
        FROM dq a CROSS JOIN q0
        WHERE a.vec_id <> 0"""
      },
      doc = "int8 scalar quantization with per-row fidelity audit vs exact cosine"),

    // --- SemDeDup-style semantic dedup: within each coarse cell
    // (label), a vector is a semantic duplicate if some LOWER-id
    // vector in the cell has cosine ≥ τ — the keep-first-representative
    // rule, one bounded within-cell join (cells cap the quadratic
    // term; the SemDeDup paper's reason for clustering first). τ=0.40
    // is fitted to this corpus's cosine quantiles so the gate actually
    // discriminates (the synthetic embeddings have no 0.9+ near-dups;
    // same fitted-threshold practice as txt_gopher_gate). Output is
    // ALL vectors with their verdict, so the hash gate sees keep and
    // drop rows.
    "dedup_semantic" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        VectorFunctions.register(s)
        val e = Tables.embeddings(s, dir)
        val a = e.select($"vec_id".as("a_id"), $"embedding".as("va"), $"label")
        val b = e.select($"vec_id".as("b_id"), $"embedding".as("vb"), $"label")
        val sim = a.join(b, Seq("label")).filter($"a_id" < $"b_id")
          .filter(round(expr("cosine_sim(va, vb)"), 4) >= 0.40)
          .groupBy($"b_id")
          .agg(count(lit(1)).as("n_sim"), min($"a_id").as("dup_of"))
        e.join(sim, $"vec_id" === $"b_id", "left")
          .select($"vec_id", $"label",
            coalesce($"n_sim", lit(0L)).as("n_sim"),
            $"dup_of",
            $"n_sim".isNotNull.as("is_dup"))
      },
      oracle = Some {
        val dot = (a: String, b: String) => foldSql(s"list_transform(list_zip($a, $b), x -> x[1] * x[2])")
        val cos = (a: String, b: String) => s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
        s"""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        sim AS (SELECT b.vec_id AS b_id, count(*) AS n_sim, min(a.vec_id) AS dup_of
                FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
                WHERE round(${cos("a.v", "b.v")}, 4) >= 0.40
                GROUP BY 1)
        SELECT e.vec_id, e.label,
               coalesce(sim.n_sim, 0) AS n_sim,
               sim.dup_of,
               sim.b_id IS NOT NULL AS is_dup
        FROM e LEFT JOIN sim ON e.vec_id = sim.b_id"""
      },
      doc = "SemDeDup: within-cell cosine >= tau vs lower-id representative, keep-first rule")
  )
}
