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
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 64): DataFrame =
    ccWithRounds(nodes, edges, maxRounds)._1

  /** As [[connectedComponents]], also returning the round count — the
    * scale smoke's evidence that rounds track DIAMETER, not size. Same
    * code path: the public method delegates here. */
  private[graft] def ccWithRounds(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): (DataFrame, Int) = {
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
    (comp, round)
  }

  /** Connected components in O(log n) rounds by alternating
    * large-star / small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the adversarial-diameter-proof
    * sibling of [[connectedComponents]]: where min-label propagation
    * needs DIAMETER rounds (a 10k-doc near-dup chain = 10k shuffles),
    * the star alternation contracts any component in O(log n) rounds.
    * Each round is two join+min passes plus a distinct over the edge
    * set; edges only ever point toward smaller ids, so the set shrinks
    * toward the final star graph (root → member). Per-round cost is
    * higher than one propagation step — [[connectedComponents]] stays
    * the default for the short-diameter graphs near-dup workloads
    * produce; this is the escape hatch the 100 TB deployment keeps for
    * graphs whose diameter is the attack surface. Both return
    * identical (id, comp) assignments — `dedup_clusters_logrounds` is
    * hash-gated against the SAME DuckDB oracle as `dedup_clusters`, so
    * the equivalence is re-proven every round.
    */
  def connectedComponentsLogRounds(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): DataFrame =
    ccLogRoundsWithRounds(nodes, edges, maxRounds)._1

  private[graft] def ccLogRoundsWithRounds(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 64): (DataFrame, Int) = {
    def canonical(e: DataFrame): DataFrame = e
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .filter(col("a") =!= col("b")).distinct()

    /** large-star: every node's strictly-larger neighbors re-attach to
      * the min of its neighborhood (incl. itself). */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      canonical(sym.filter(col("v") > col("u")).join(m, "u")
        .select(col("v").as("x"), col("m").as("y")))
    }

    /** small-star: every node's smaller-or-equal neighbors (and itself)
      * re-attach to the min of that set. */
    def smallStar(e: DataFrame): DataFrame = {
      // canonical edges already satisfy a < b: orient b → a
      val dir = e.select(col("b").as("u"), col("a").as("v"))
      val m = dir.groupBy("u").agg(min("v").as("m"))
      canonical(
        dir.join(m, "u").select(col("v").as("x"), col("m").as("y"))
          .union(m.select(col("u").as("x"), col("m").as("y"))))
    }

    var e = canonical(edges.select(col("src").as("x"), col("dst").as("y")))
      .localCheckpoint()
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      stable = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      e = next
      round += 1
    }
    require(stable, s"star alternation did not converge in $maxRounds rounds")
    // fixpoint edges form stars (root=a, member=b): comp(member) = root,
    // comp(root) = root, isolated nodes = themselves
    val comp = e.groupBy(col("b").as("id")).agg(min("a").as("root"))
    (nodes.select(col("id")).join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("comp")), round)
  }

  /** The `dedup_clusters` build body, parameterized by the component
    * algorithm — both registry entries run THIS code, so the only
    * degree of freedom between them is the algorithm under test. */
  private def clustersBuild(cc: (DataFrame, DataFrame) => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // checkpoint ACROSS jobs (the policy stated on minhashPairs):
    // the LSH+verify lineage would otherwise re-run every round
    val pairs = Dedup.minhashPairs(s, dir)
      .select($"a_id".as("src"), $"b_id".as("dst"))
      .localCheckpoint()
    val nodes = Tables.documents(s, dir).select($"doc_id".as("id"))
    val comp = cc(nodes, pairs)
    val sz = comp.groupBy($"comp").agg(count(lit(1)).as("cluster_size"))
    comp.join(sz, "comp")
      .select($"id".as("doc_id"), $"comp".as("cluster_id"),
        $"cluster_size", ($"id" === $"comp").as("keep"))
  }

  /** Shared DuckDB twin of both cluster entries — an independent
    * recursive-CTE reachable-minimum fixpoint over the same pair CTEs. */
  private val clustersOracle: String = s"""
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
        FROM comp c JOIN sz s USING (cluster_id)"""

  val defs: Map[String, QueryDef] = Map(
    // ---- cluster assignment over the minhash near-dup graph: every
    // document gets (cluster_id = component-min doc_id, cluster_size,
    // keep = is-the-keeper). Docs with no near-dup are size-1 keepers.
    "dedup_clusters" -> QueryDef(
      build = clustersBuild(connectedComponents(_, _)),
      oracle = Some(clustersOracle),
      doc = "near-dup cluster assignment: connected components (min-label propagation) over the minhash pair graph + keeper election"),

    // ---- the SAME assignment through the O(log n)-round star
    // alternation, hash-checked against the SAME oracle: the two
    // algorithms' equivalence is a per-round gate, like the LSH
    // planes-8/planes-12 pair.
    "dedup_clusters_logrounds" -> QueryDef(
      build = clustersBuild(connectedComponentsLogRounds(_, _)),
      oracle = Some(clustersOracle),
      doc = "cluster assignment via large-star/small-star (Kiveris SoCC'14): O(log n) rounds, diameter-independent — same oracle as dedup_clusters")
  )
}
