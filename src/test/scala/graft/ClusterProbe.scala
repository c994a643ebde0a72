package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r22 stage-level probe for the cluster/pipe/profile targets (guide
  * §1: measure first). Times the component-iteration internals — pair
  * build, per-algorithm fixpoint loop, keeper windows — with the noop
  * sink, min of `Reps`, bench-style isolation.
  *
  *   sbt "Test/runMain graft.ClusterProbe /root/testdata/sf0.1 32"
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = Sessions.local(cores = cores, appName = "graft-clusterprobe")
    spark.sparkContext.setLogLevel("WARN")
    val Reps = 3

    def time(name: String)(body: => Unit): Unit = {
      val secs = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"probe: $name")
        body
        val s = (System.nanoTime() - t0) / 1e9
        Bench.isolate(spark)
        s
      }
      println(f"PROBE $name%-34s min=${secs.min}%7.3f  all=${secs.map(x => f"$x%.3f").mkString(",")}")
    }
    def timeDf(name: String)(mk: => DataFrame): Unit =
      time(name)(mk.write.format("noop").mode("overwrite").save())

    import spark.implicits._
    import graft.ext.{Cluster, Dedup}

    // warm-up
    Cluster.defs("dedup_clusters").build(spark, "/root/testdata/sf0.001").collect()
    Cluster.defs("dedup_clusters_logrounds").build(spark, "/root/testdata/sf0.001").collect()
    Bench.isolate(spark)

    def pairs(): DataFrame = Dedup.minhashPairs(spark, dir)
      .select($"a_id".as("src"), $"b_id".as("dst"), $"jaccard")
    def nodes(): DataFrame = Tables.documents(spark, dir).select($"doc_id".as("id"))

    timeDf("pairs-build-only")(pairs())
    time("pairs-localCheckpoint")(pairs().localCheckpoint())

    // loop cost with a PRE-materialized edge set: isolates the iteration
    time("cc-loop-only") {
      val p = pairs().localCheckpoint()
      val t0 = System.nanoTime()
      val (comp, rounds) = Cluster.ccWithRounds(nodes(), p)
      comp.write.format("noop").mode("overwrite").save()
      println(f"   cc-loop rounds=$rounds  inner=${(System.nanoTime() - t0) / 1e9}%7.3f")
    }
    time("cc-logrounds-only") {
      val p = pairs().localCheckpoint()
      val t0 = System.nanoTime()
      val (comp, rounds) = Cluster.ccLogRoundsWithRounds(nodes(), p)
      comp.write.format("noop").mode("overwrite").save()
      println(f"   logrounds rounds=$rounds  inner=${(System.nanoTime() - t0) / 1e9}%7.3f")
    }
    time("cc-loop-tau0.5") {
      val p = pairs().filter($"jaccard" >= 0.5).localCheckpoint()
      val t0 = System.nanoTime()
      val (comp, rounds) = Cluster.ccWithRounds(nodes(), p)
      comp.write.format("noop").mode("overwrite").save()
      println(f"   cc-loop tau rounds=$rounds  inner=${(System.nanoTime() - t0) / 1e9}%7.3f")
    }

    timeDf("clusters-full")(Cluster.defs("dedup_clusters").build(spark, dir))
    timeDf("clusters-logrounds-full")(Cluster.defs("dedup_clusters_logrounds").build(spark, dir))
    timeDf("clusters-incremental-full")(Cluster.defs("dedup_clusters_incremental").build(spark, dir))
    timeDf("keeper-quality-full")(Cluster.defs("dedup_keeper_quality").build(spark, dir))
    timeDf("keeper-salted-full")(Cluster.defs("dedup_keeper_salted").build(spark, dir))
    timeDf("quality-score-only")(
      graft.ext.TextStats.defs("txt_quality_score").build(spark, dir))
    spark.stop()
  }
}
