package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** r22 bisect probe for the connected-components round shape: times the
  * min-label loop under different per-round barrier + join-shape
  * variants over the SAME pre-materialized edge set.
  *
  *   sbt "Test/runMain graft.LoopProbe /root/testdata/sf0.1 32"
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = Sessions.local(cores = cores, appName = "graft-loopprobe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ext.Dedup

    // warm-up + shared pre-materialized inputs
    graft.ext.Cluster.defs("dedup_clusters").build(spark, "/root/testdata/sf0.001").collect()
    Bench.isolate(spark)

    def freshPairs(): DataFrame = Dedup.minhashPairs(spark, dir)
      .select($"a_id".as("src"), $"b_id".as("dst"))
    def freshNodes(): DataFrame = Tables.documents(spark, dir).select($"doc_id".as("id"))

    val Reps = 3
    def time(name: String)(body: (DataFrame, DataFrame) => Unit): Unit = {
      val secs = (1 to Reps).map { _ =>
        val p = freshPairs().localCheckpoint()
        val n = freshNodes().localCheckpoint()
        val t0 = System.nanoTime()
        body(n, p)
        val s = (System.nanoTime() - t0) / 1e9
        Bench.isolate(spark)
        s
      }
      println(f"LOOP $name%-34s min=${secs.min}%7.3f  all=${secs.map(x => f"$x%.3f").mkString(",")}")
    }

    // V0: r21 shape — nbr agg + left join, eager localCheckpoint + count
    time("v0-r21-shape") { (nodes, edges) =>
      val sym = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      var comp = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
      var moved = 1L; var round = 0
      while (moved > 0 && round < 64) {
        val nbr = sym
          .join(comp.select(col("id").as("src"), col("comp").as("scomp")), "src")
          .groupBy(col("dst").as("id")).agg(min("scomp").as("nc"))
        val next = comp.join(nbr, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"),
            (coalesce(col("nc"), col("comp")) < col("comp")).as("moved"))
          .localCheckpoint()
        moved = next.filter(col("moved")).count()
        comp = next.drop("moved")
        round += 1
      }
      comp.write.format("noop").mode("overwrite").save()
    }

    def sumOf(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }

    // V1: union+groupBy algebra, lazy localCheckpoint barrier, sum test
    time("v1-unionagg-lazylc") { (nodes, edges) =>
      val sym = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      var comp = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
      var prev = sumOf(comp); var moved = true; var round = 0
      while (moved && round < 64) {
        val next = sym
          .join(comp.select(col("id").as("src"), col("comp").as("scomp")), "src")
          .select(col("dst").as("id"), col("scomp").as("comp"))
          .union(comp)
          .groupBy(col("id")).agg(min("comp").as("comp"))
          .localCheckpoint(false)
        val s = sumOf(next)
        moved = s.compareTo(prev) != 0; prev = s; comp = next; round += 1
      }
      comp.write.format("noop").mode("overwrite").save()
    }

    // V2: V1 + sym pre-partitioned by src and localCheckpointed
    time("v2-sympart-lazylc") { (nodes, edges) =>
      val nShuffle = spark.sessionState.conf.numShufflePartitions
      val sym = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(nShuffle, col("src"))
        .localCheckpoint()
      var comp = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
      var prev = sumOf(comp); var moved = true; var round = 0
      while (moved && round < 64) {
        val next = sym
          .join(comp.select(col("id").as("src"), col("comp").as("scomp")), "src")
          .select(col("dst").as("id"), col("scomp").as("comp"))
          .union(comp)
          .groupBy(col("id")).agg(min("comp").as("comp"))
          .localCheckpoint(false)
        val s = sumOf(next)
        moved = s.compareTo(prev) != 0; prev = s; comp = next; round += 1
      }
      comp.write.format("noop").mode("overwrite").save()
    }

    // V3: as committed — loopBarrier (createDataFrame + DISK_ONLY), sym persisted
    time("v3-asCommitted") { (nodes, edges) =>
      val (comp, _) = graft.ext.Cluster.ccWithRounds(nodes, edges)
      comp.write.format("noop").mode("overwrite").save()
    }

    // V4: V2 but barrier = createDataFrame(rdd) + MEMORY_AND_DISK persist
    time("v4-rddbar-memdisk") { (nodes, edges) =>
      val nShuffle = spark.sessionState.conf.numShufflePartitions
      def bar(df: DataFrame): DataFrame = {
        val out = spark.createDataFrame(df.rdd, df.schema)
        out.persist(StorageLevel.MEMORY_AND_DISK)
        out
      }
      val sym = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(nShuffle, col("src"))
        .localCheckpoint()
      var comp = bar(nodes.select(col("id"), col("id").as("comp")))
      var prev = sumOf(comp); var moved = true; var round = 0
      while (moved && round < 64) {
        val next = bar(sym
          .join(comp.select(col("id").as("src"), col("comp").as("scomp")), "src")
          .select(col("dst").as("id"), col("scomp").as("comp"))
          .union(comp)
          .groupBy(col("id")).agg(min("comp").as("comp")))
        val s = sumOf(next)
        comp.unpersist()
        moved = s.compareTo(prev) != 0; prev = s; comp = next; round += 1
      }
      comp.write.format("noop").mode("overwrite").save()
    }

    // V5: V2 without the sym repartition (is partition reuse worth it?)
    time("v5-nosympart-lazylc") { (nodes, edges) =>
      val sym = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      var comp = nodes.select(col("id"), col("id").as("comp")).localCheckpoint()
      var prev = sumOf(comp); var moved = true; var round = 0
      while (moved && round < 64) {
        val next = sym
          .join(comp.select(col("id").as("src"), col("comp").as("scomp")), "src")
          .select(col("dst").as("id"), col("scomp").as("comp"))
          .union(comp)
          .groupBy(col("id")).agg(min("comp").as("comp"))
          .localCheckpoint(false)
        val s = sumOf(next)
        moved = s.compareTo(prev) != 0; prev = s; comp = next; round += 1
      }
      comp.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
