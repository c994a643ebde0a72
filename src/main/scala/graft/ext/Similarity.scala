package graft.ext

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table.
  *
  *  - brute-force cosine top-k: the exact baseline — broadcast the query
  *    set against the candidate scan; one pass, no shuffle of the big
  *    side, ranking via per-query window top-k.
  *  - LSH-bucketed top-k (scale path): random-hyperplane signatures
  *    (planes sampled deterministically from the data itself), bucket
  *    join, rank within bucket. Candidate count drops from n² to
  *    n²/2^bits, which is what survives a 100 TB corpus.
  *  - IVF-style top-k: coarse quantization by the `label` column (the
  *    stand-in for a k-means cell id); probe only the query's cell.
  *
  * All ranking is over `round(cos, 4)` with vec_id tie-breaks so the
  * result set is insensitive to sub-ulp engine differences.
  */
object Similarity {

  /** DuckDB sequential dot product — same accumulation order as the
    * native CosineSimilarity expression's loop. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), x -> x[1] * x[2]), (p, q) -> p + q)"
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** (vec_id, bucket): random-hyperplane signature buckets — planes are
    * the first `planes` data vectors (deterministic sample). Exposed so
    * the scale smoke can count per-bucket candidate pairs with the same
    * code the query runs; `planes` is THE scale knob (candidates ~
    * n²/2^planes, so planes grows with log₂ n to hold candidates-per-
    * vector constant — the registered query pins planes=8). */
  def hyperplaneBuckets(s: SparkSession, dir: String, planes: Int): DataFrame = {
    import s.implicits._
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val pl = e.filter($"vec_id" < planes)
      .select($"vec_id".as("p_id"), $"embedding".as("pv"))
    e.crossJoin(broadcast(pl))
      .select($"vec_id",
        when(expr("dot_product(embedding, pv)") > 0,
          expr("shiftleft(1L, p_id)")).otherwise(0L).as("bit"))
      .groupBy($"vec_id").agg(sum($"bit").as("bucket"))
  }

  /** Bucket-join top-k at a given plane count — `sim_lsh_bucket_topk`
    * is exactly `lshTopk(_, _, 8)`. */
  def lshTopk(s: SparkSession, dir: String, planes: Int): DataFrame = {
    import s.implicits._
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val sig = hyperplaneBuckets(s, dir, planes)
    val withB = e.join(sig, "vec_id")
    val a = withB.select($"vec_id".as("q_id"), $"embedding".as("qv"), $"bucket")
    val b = withB.select($"vec_id".as("n_id"), $"embedding".as("nv"), $"bucket")
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id".asc)
    a.join(b, Seq("bucket")).filter($"q_id" =!= $"n_id")
      .select($"q_id", $"n_id", $"bucket",
        round(expr("cosine_sim(qv, nv)"), 4).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
  }

  val defs: Map[String, QueryDef] = Map(
    // exact brute-force cosine top-5 per query vector
    "sim_cosine_topk" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        VectorFunctions.register(s)
        val e = Tables.embeddings(s, dir)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("qv"))
        val c = e.select($"vec_id".as("n_id"), $"embedding".as("nv"))
        val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id".asc)
        c.join(broadcast(q), $"q_id" =!= $"n_id")
          .select($"q_id", $"n_id", round(expr("cosine_sim(qv, nv)"), 4).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 5)
      },
      oracle = Some(s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
                          round(${cosSql("q.v", "c.v")}, 4) AS cos
                   FROM e q JOIN e c ON q.vec_id <> c.vec_id
                   WHERE q.vec_id < 10)
        SELECT q_id, n_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
        FROM scored
        QUALIFY rank <= 5"""),
      doc = "ANN baseline: brute-force cosine top-5, broadcast query side"),

    // LSH-bucketed top-k: 8 data-sampled hyperplanes → 256 buckets
    // (shared parametric body: [[lshTopk]])
    "sim_lsh_bucket_topk" -> QueryDef(
      build = (s, dir) => lshTopk(s, dir, 8),
      oracle = Some(s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        planes AS (SELECT vec_id AS p_id, v AS pv FROM e WHERE vec_id < 8),
        sig AS (SELECT e.vec_id,
                       CAST(sum(CASE WHEN ${dotSql("e.v", "p.pv")} > 0
                                     THEN (1::BIGINT << p.p_id) ELSE 0 END) AS BIGINT) AS bucket
                FROM e CROSS JOIN planes p GROUP BY 1),
        wb AS (SELECT e.vec_id, e.v, sig.bucket FROM e JOIN sig ON e.vec_id = sig.vec_id),
        scored AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, a.bucket,
                          round(${cosSql("a.v", "b.v")}, 4) AS cos
                   FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
        SELECT q_id, n_id, bucket, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
        FROM scored
        QUALIFY rank <= 3"""),
      doc = "ANN scale path: random-hyperplane LSH buckets, rank within bucket"),

    // The scale KNOB itself, oracle-gated: the 100 TB deployment shape
    // grows `planes` with log₂ n (measured flat in PLANS.md's decade
    // table); this entry hash-checks [[lshTopk]] at a second plane count
    // (12 → 4096 buckets) so the knob's correctness — not just its
    // candidate counts — is verified per round.
    "sim_lsh_planes12_topk" -> QueryDef(
      build = (s, dir) => lshTopk(s, dir, 12),
      oracle = Some(s"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        planes AS (SELECT vec_id AS p_id, v AS pv FROM e WHERE vec_id < 12),
        sig AS (SELECT e.vec_id,
                       CAST(sum(CASE WHEN ${dotSql("e.v", "p.pv")} > 0
                                     THEN (1::BIGINT << p.p_id) ELSE 0 END) AS BIGINT) AS bucket
                FROM e CROSS JOIN planes p GROUP BY 1),
        wb AS (SELECT e.vec_id, e.v, sig.bucket FROM e JOIN sig ON e.vec_id = sig.vec_id),
        scored AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, a.bucket,
                          round(${cosSql("a.v", "b.v")}, 4) AS cos
                   FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
        SELECT q_id, n_id, bucket, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
        FROM scored
        QUALIFY rank <= 3"""),
      doc = "LSH scale knob oracle-gated: same lshTopk body at planes=12 (4096 buckets)"),

    // embedding preprocessing: L2 normalization (sequential-fold norm,
    // so values are engine-exact); scalar projections keep the compare
    // surface hash-stable
    "sim_l2_normalize" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.embeddings(s, dir)
          .withColumn("norm", sqrt(expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0d, (a, b) -> a + b)")))
          .select($"vec_id", round($"norm", 6).as("l2_norm"),
            round(expr("CAST(embedding[0] AS DOUBLE)") / $"norm", 6).as("first_unit"),
            round(expr("CAST(embedding[63] AS DOUBLE)") / $"norm", 6).as("last_unit"))
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, v,
                     sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)), (a, b) -> a + b)) AS norm
              FROM e)
        SELECT vec_id, round(norm, 6) AS l2_norm,
               round(v[1] / norm, 6) AS first_unit,
               round(v[64] / norm, 6) AS last_unit
        FROM n"""),
      doc = "embedding L2 normalization (exact sequential-fold norms)"),

    // IVF-style: probe only the query's coarse cell (label column)
    "sim_ivf_label_topk" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        VectorFunctions.register(s)
        val e = Tables.embeddings(s, dir)
        val q = e.filter($"vec_id" < 20)
          .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"label")
        val c = e.select($"vec_id".as("n_id"), $"embedding".as("nv"), $"label")
        val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id".asc)
        c.join(broadcast(q), Seq("label")).filter($"q_id" =!= $"n_id")
          .select($"q_id", $"n_id", $"label",
            round(expr("cosine_sim(qv, nv)"), 4).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 3)
      },
      oracle = Some(s"""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, q.label,
                          round(${cosSql("q.v", "c.v")}, 4) AS cos
                   FROM e q JOIN e c ON q.label = c.label AND q.vec_id <> c.vec_id
                   WHERE q.vec_id < 20)
        SELECT q_id, n_id, label, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
        FROM scored
        QUALIFY rank <= 3"""),
      doc = "ANN IVF path: coarse-cell probe via label partition")
  )
}
