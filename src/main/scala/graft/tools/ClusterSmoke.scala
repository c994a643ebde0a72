package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Bench
import graft.ext.{Cluster, Dedup}

/** ×K decade smoke for the cluster-assignment operators — the
  * connected-components step behind `dedup_clusters` /
  * `dedup_clusters_logrounds`.
  *
  * Extracted-code discipline: the timed calls ARE
  * [[Cluster.ccWithRounds]] / [[Cluster.ccLogRoundsWithRounds]] — the
  * production loops, driven to full evaluation by the component-count
  * aggregate. The edge set is seeded ONCE from the production
  * [[Dedup.minhashPairs]] at sf0.1 (parqueted), then grown ×1/×10/×100
  * as DISJOINT id-offset copies: per-copy graph structure is constant,
  * so component count must scale exactly ×K (asserted) and min-label
  * round count must stay FLAT (diameter unchanged) while wall tracks
  * edge volume. That separation — rounds = f(diameter), wall =
  * f(|E|) — is the operator's 100 TB claim.
  *
  * Second series: an adversarial CHAIN (diameter = n-1, the min-label
  * killer that ClusterSpec proves non-convergent at bounded rounds)
  * grown ×10 per decade, through the star alternation only — its round
  * count must grow ~log n, not n. The contrast number for min-label is
  * the spec's: 300-chain already exceeds a 20-round cap; decades of it
  * would be hours, so no env-gated mutant series here, the growth law
  * is structural (1 round = 1 hop).
  *
  * Usage: sbt "runMain graft.tools.ClusterSmoke"
  */
object ClusterSmoke {

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val all = scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder()).iterator().asScala.toSeq)
      all.foreach(Files.delete)
    }

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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Cache key includes a cheap corpus fingerprint (row count + max
    // doc_id, one-column scan) so a driver-side testdata regeneration
    // — a known recurring event — reseeds instead of validating the
    // xK assertions against a stale pair graph.
    val fp = {
      val r = spark.read.parquet(s"$sf/documents.parquet")
        .agg(count(lit(1)), max(col("doc_id"))).collect()(0)
      s"n${r.getLong(0)}-m${r.getLong(1)}"
    }
    val seedDir = s"/tmp/graft-scale/cluster/v1/${Paths.get(sf).getFileName}-$fp"
    if (!Files.exists(Paths.get(s"$seedDir/pairs"))) {
      Dedup.minhashPairs(spark, sf).select("a_id", "b_id")
        .write.mode("overwrite").parquet(s"$seedDir/pairs")
      spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
        .write.mode("overwrite").parquet(s"$seedDir/nodes")
    }
    val pairs0 = spark.read.parquet(s"$seedDir/pairs")
    val nodes0 = spark.read.parquet(s"$seedDir/nodes")

    val Off = 10000000L
    def grown(df: DataFrame, k: Int, cols: Seq[String]): DataFrame =
      (0 until k).map { i =>
        df.select(cols.map(c => (col(c) + lit(i * Off)).as(c)): _*)
      }.reduce(_ unionByName _)

    def timed[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      val sec = (System.nanoTime() - t0) / 1e9
      Bench.isolate(spark)
      (sec, a)
    }

    // JIT warm-up (untimed)
    {
      Cluster.ccWithRounds(nodes0.select(col("doc_id").as("id")),
        pairs0.select(col("a_id").as("src"), col("b_id").as("dst")))._1
        .agg(countDistinct("comp")).collect()
      Cluster.ccLogRoundsWithRounds(nodes0.select(col("doc_id").as("id")),
        pairs0.select(col("a_id").as("src"), col("b_id").as("dst")))._1
        .agg(countDistinct("comp")).collect()
      Bench.isolate(spark)
    }

    var baseComponents = -1L
    for (k <- Seq(1, 10, 100)) {
      // parquet-materialized (NOT localCheckpoint: Bench.isolate between
      // passes evicts local-checkpoint blocks) — also the honest input
      // shape: production reads its pair table from storage too
      val kd = s"$seedDir/x$k"
      if (!Files.exists(Paths.get(s"$kd/edges"))) {
        grown(nodes0, k, Seq("doc_id")).select(col("doc_id").as("id"))
          .write.mode("overwrite").parquet(s"$kd/nodes")
        grown(pairs0, k, Seq("a_id", "b_id"))
          .select(col("a_id").as("src"), col("b_id").as("dst"))
          .write.mode("overwrite").parquet(s"$kd/edges")
        // the derived old-assignment cache (incremental series below) is
        // a function of THESE fixtures: rebuilding them must invalidate
        // it, or the incremental-equals-batch assert would compare the
        // new graph against a stale persisted state (r18 ADVICE item 5)
        deleteRecursively(Paths.get(s"$kd/oldasg"))
      }
      val nodes = spark.read.parquet(s"$kd/nodes")
      val edges = spark.read.parquet(s"$kd/edges")
      val nEdges = edges.count()

      for ((name, run) <- Seq[(String, () => (DataFrame, Int))](
        "minlabel" -> (() => Cluster.ccWithRounds(nodes, edges)),
        "logrounds" -> (() => Cluster.ccLogRoundsWithRounds(nodes, edges)))) {
        def pass(): (Double, (Long, Int)) = timed {
          val (comp, rounds) = run()
          (comp.agg(countDistinct("comp")).collect()(0).getLong(0), rounds)
        }
        val (s1, r1) = pass(); val (s2, r2) = pass()
        assert(r1 == r2, s"nondeterministic result at x$k/$name")
        val (nComp, rounds) = r1
        if (name == "minlabel" && k == 1) baseComponents = nComp
        assert(nComp == baseComponents * k,
          s"component count must scale exactly xK: x$k/$name got $nComp, want ${baseComponents * k}")
        println(f"""{"cluster":"real","algo":"$name","scale":$k,"edges":$nEdges,"components":$nComp,"rounds":$rounds,"min_of_2_sec":${math.min(s1, s2)}%.2f}""")
      }
    }

    // incremental series: assign a ~10 % delta (doc_id%10==9, preserved
    // across the ×K id-offset copies since the offset is 0 mod 10) to
    // the persisted 90 %-corpus assignment — the frontier-only claim of
    // Cluster.assignIncremental measured at decades. The persisted
    // assignment is computed once and parqueted UNTIMED (it is the
    // state a deployment already has); the timed body is the real
    // production call: map delta endpoints through the old assignment,
    // iterate the frontier, relabel. In-line assert: the incremental
    // partition must land on EXACTLY the batch component count
    // (baseComponents × K — the invariance law ClusterSpec proves on
    // random graphs, re-checked here on the real graph at every scale).
    for (k <- Seq(1, 10, 100)) {
      val kd = s"$seedDir/x$k"
      val nodes = spark.read.parquet(s"$kd/nodes")
      val edges = spark.read.parquet(s"$kd/edges")
      val isOldN = pmod(col("id"), lit(10)) =!= 9
      val oldNodes = nodes.filter(isOldN)
      val newNodes = nodes.filter(!isOldN)
      val isOldE = (c: String) => pmod(col(c), lit(10)) =!= 9
      val oldEdges = edges.filter(isOldE("src") && isOldE("dst"))
      val delta = edges.filter(!(isOldE("src") && isOldE("dst")))
      if (!Files.exists(Paths.get(s"$kd/oldasg"))) {
        Cluster.connectedComponents(oldNodes, oldEdges)
          .write.mode("overwrite").parquet(s"$kd/oldasg")
      }
      val oldAsg = spark.read.parquet(s"$kd/oldasg")
      val deltaEdges = delta.count()
      val newCount = newNodes.count()
      def pass(): (Double, Long) = timed {
        Cluster.assignIncremental(oldAsg, newNodes, delta)
          .agg(countDistinct("comp")).collect()(0).getLong(0)
      }
      val (s1, c1) = pass(); val (s2, c2) = pass()
      assert(c1 == c2, s"nondeterministic incremental result at x$k")
      assert(c1 == baseComponents * k,
        s"incremental partition must equal batch: x$k got $c1, want ${baseComponents * k}")
      println(f"""{"cluster":"incremental","scale":$k,"delta_edges":$deltaEdges,"new_docs":$newCount,"components":$c1,"min_of_2_sec":${math.min(s1, s2)}%.2f}""")
    }

    // adversarial chain decades: diameter 10k → 1M, star alternation only
    for (n <- Seq(10000L, 100000L, 1000000L)) {
      // range lineage is free to recompute — no checkpoint needed
      val nodes = spark.range(1, n + 1).select(col("id"))
      val edges = spark.range(1, n)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      def pass(): (Double, (Long, Int)) = timed {
        val (comp, rounds) = Cluster.ccLogRoundsWithRounds(nodes, edges, maxRounds = 96)
        (comp.agg(countDistinct("comp")).collect()(0).getLong(0), rounds)
      }
      val (s1, r1) = pass(); val (s2, r2) = pass()
      assert(r1 == r2 && r1._1 == 1L, s"chain $n must collapse to one component")
      println(f"""{"cluster":"chain","algo":"logrounds","n":$n,"rounds":${r1._2},"min_of_2_sec":${math.min(s1, s2)}%.2f}""")
    }
    spark.stop()
  }
}
