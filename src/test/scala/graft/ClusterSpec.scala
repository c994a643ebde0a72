package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of ext/Cluster.connectedComponents the value-level oracle
  * can't see: convergence on hand-built graph shapes, singleton
  * handling, and the transitive-closure semantics (a chain clusters
  * end-to-end even though its endpoints never share a pair). */
class ClusterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-cluster")

  private def components(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    graft.ext.Cluster.connectedComponents(n, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain clusters transitively to the min endpoint; disjoint parts stay apart") {
    // 1-2-3-4 is a path (no direct 1-4 pair), {10,11} a separate pair,
    // 99 isolated. Min-label must flow the full chain length.
    val comp = components(
      nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L),
      edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("edge orientation and duplicates don't change the result") {
    val a = components(Seq(5L, 6L, 7L), Seq((7L, 5L), (6L, 7L)))
    val b = components(Seq(5L, 6L, 7L), Seq((5L, 7L), (7L, 6L), (6L, 7L), (7L, 5L)))
    assert(a == b && a.values.toSet == Set(5L))
  }

  test("star graph converges in few rounds and elects the hub-independent min") {
    // hub 50 with spokes 1..20: min is a SPOKE, so labels must cross
    // the hub — catches any implementation that only pushes labels
    // one direction.
    val spokes = (1L to 20L)
    val comp = components(50L +: spokes, spokes.map(sp => (50L, sp)))
    assert(comp.values.toSet == Set(1L))
  }

  test("dedup_clusters: keeper per cluster, sizes sum to corpus, pair endpoints co-clustered") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_clusters")(spark, sf)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val total = Tables.documents(spark, sf).count()
    assert(rows.length == total, "every document is assigned a cluster")
    // exactly one keeper per cluster, and it is the cluster min
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._4) == 1, s"cluster $cid keeper count")
      assert(members.filter(_._4).head._1 == cid, s"cluster $cid keeper is the min id")
      assert(members.forall(_._3 == members.length), s"cluster $cid size column")
    }
    // every near-dup pair's endpoints share a cluster id
    val cid = rows.map(r => r._1 -> r._2).toMap
    val pairs = graft.ext.Dedup.minhashPairs(spark, sf)
      .select("a_id", "b_id").collect()
    pairs.foreach { p =>
      assert(cid(p.getLong(0)) == cid(p.getLong(1)),
        s"pair ${p.getLong(0)},${p.getLong(1)} split across clusters")
    }
  }
}
