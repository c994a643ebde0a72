package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup CLUSTER ASSIGNMENT — the step a training-data pipeline runs
  * after pair generation: fold the near-dup pair graph into connected
  * components, give every document a cluster id, and elect one keeper
  * per cluster (the rest are the dedup drop set).
  *
  * The edge set is [[Dedup.minhashPairs]] — the exact frame the
  * `dedup_minhash_lsh` query returns, so "near-dup pair" has ONE
  * definition across the pair query and the cluster query and the two
  * cannot drift. The oracle re-derives components independently in
  * DuckDB with a recursive CTE (reachable-minimum fixpoint), so the
  * Spark iteration is hash-checked against a different algorithm, not
  * an echo of itself.
  *
  * Scale (100 TB lens): min-label propagation — the same algorithm
  * GraphX's Pregel connectedComponents runs — costs one equi-join +
  * partial-aggregated min per round, and the round count is the
  * component DIAMETER, not the component size. Near-dup graphs are
  * short-diameter by construction (template clusters are dense;
  * transitive chains of ≥0.01-Jaccard pairs are shallow), so the loop
  * is a handful of shuffles over |E| rows — at sf0.01 the fixpoint
  * lands in 3 rounds. Each round localCheckpoints (≤|V| rows) to cut
  * lineage, so plan size stays constant regardless of round count. For
  * adversarial long-chain graphs the log-round alternative is
  * large-star/small-star (Kiveris et al., MapReduce'14); not needed for
  * this operator's workload shape and diameter-bounded rounds are the
  * honest default.
  */
object Cluster {

  /** Connected components of an undirected graph by iterative min-label
    * propagation. `nodes`: one `id` column (isolated nodes become their
    * own singleton component); `edges`: `src`/`dst` (one row per
    * undirected edge, either orientation). Returns (id, comp) where
    * comp = min id of the component — deterministic, engine-independent.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    var comp = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
    var moved = 1L
    var round = 0
    while (moved > 0 && round < maxRounds) {
      // each node pulls the min label of its neighborhood (map-side
      // partial min before the shuffle — the agg carries one row per
      // (dst, partition), never the neighbor list)
      val nbr = sym
        .join(comp.select(col("id").as("src"), col("comp").as("scomp")), "src")
        .groupBy(col("dst").as("id")).agg(min("scomp").as("nc"))
      val next = comp.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"),
          (coalesce(col("nc"), col("comp")) < col("comp")).as("moved"))
        .localCheckpoint() // materialize ≤|V| rows; cut the per-round lineage
      moved = next.filter(col("moved")).count()
      comp = next.drop("moved")
      round += 1
    }
    require(moved == 0, s"connectedComponents did not converge in $maxRounds rounds")
    comp
  }

  val defs: Map[String, QueryDef] = Map(
    // ---- cluster assignment over the minhash near-dup graph: every
    // document gets (cluster_id = component-min doc_id, cluster_size,
    // keep = is-the-keeper). Docs with no near-dup are size-1 keepers.
    "dedup_clusters" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        // checkpoint ACROSS jobs (the policy stated on minhashPairs):
        // the LSH+verify lineage would otherwise re-run every round
        val pairs = Dedup.minhashPairs(s, dir)
          .select($"a_id".as("src"), $"b_id".as("dst"))
          .localCheckpoint()
        val nodes = Tables.documents(s, dir).select($"doc_id".as("id"))
        val comp = connectedComponents(nodes, pairs)
        val sz = comp.groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
        comp.join(sz, "comp")
          .select($"id".as("doc_id"), $"comp".as("cluster_id"),
            $"cluster_size", ($"id" === $"comp").as("keep"))
      },
      oracle = Some(s"""
        WITH RECURSIVE ${Dedup.minhashPairsCtes},
        sym AS (SELECT a_id AS src, b_id AS dst FROM pairs
                UNION ALL SELECT b_id, a_id FROM pairs),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT s.dst, r.r FROM reach r JOIN sym s ON s.src = r.id),
        comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
        SELECT c.doc_id, c.cluster_id, s.cluster_size,
               c.doc_id = c.cluster_id AS keep
        FROM comp c JOIN sz s USING (cluster_id)"""),
      doc = "near-dup cluster assignment: connected components (min-label propagation) over the minhash pair graph + keeper election")
  )
}
