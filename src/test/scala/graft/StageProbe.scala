package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level timing probe for the minhash/cluster family (r21
  * optimization round, guide §1: decide WHERE the time goes before
  * touching anything). Times each sub-frame of the pair pipeline with
  * the noop sink, min of `Reps`, bench-style isolation between reps.
  *
  *   sbt "Test/runMain graft.StageProbe /root/testdata/sf0.1 32"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = Sessions.local(cores = cores, appName = "graft-stageprobe")
    spark.sparkContext.setLogLevel("WARN")
    val Reps = 3

    def time(name: String)(mk: => DataFrame): Unit = {
      val secs = (1 to Reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"probe: $name")
        mk.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        Bench.isolate(spark)
        s
      }
      println(f"PROBE $name%-28s min=${secs.min}%7.3f  all=${secs.map(x => f"$x%.3f").mkString(",")}")
    }

    import spark.implicits._
    import graft.ext.{Cluster, Dedup}

    // warm-up
    Dedup.minhashPairs(spark, "/root/testdata/sf0.001").collect()
    Bench.isolate(spark)

    val docs = Tables.documents(spark, dir)
    time("documents-scan")(docs)
    time("tokenize")(docs.withColumn("toks", expr(graft.ext.TextExpr.toksE))
      .select($"doc_id", size($"toks").as("n")))
    time("shingles-explode") {
      docs.withColumn("toks", expr(graft.ext.TextExpr.toksE))
        .select($"doc_id", explode(expr(graft.ext.TextExpr.shinglesE)).as("sh"))
    }
    time("minhash-sigs") {
      val sh = docs.withColumn("toks", expr(graft.ext.TextExpr.toksE))
        .select($"doc_id", explode(expr(graft.ext.TextExpr.shinglesE)).as("sh"))
      val sigCols = (0 until 8).map(k =>
        min(md5(concat_ws("|", lit(k), $"sh"))).as(s"h$k"))
      sh.groupBy($"doc_id").agg(sigCols.head, sigCols.tail :+ count(lit(1)).as("n"): _*)
    }
    time("pairs-full")(Dedup.minhashPairs(spark, dir))
    time("clusters-full")(graft.ext.Cluster.defs("dedup_clusters").build(spark, dir))
    time("keeper-quality")(Cluster.defs("dedup_keeper_quality").build(spark, dir))
    time("funnel")(graft.ext.Pipe.defs("pipe_corpus_funnel").build(spark, dir))
    time("end2end")(graft.ext.Pipe.defs("pipe_corpus_end2end").build(spark, dir))
    time("span-redundancy")(graft.ext.TextStats.defs("txt_span_redundancy").build(spark, dir))
    time("qa-profile")(graft.ext.Profile.defs("qa_profile").build(spark, dir))
    time("simhash")(Dedup.defs("dedup_simhash").build(spark, dir))
    spark.stop()
  }
}
