package graft

import java.nio.file.Files
import graft.etl.MergeWriter
import graft.ext.{Cluster, Pipe, StreamingPipe, TextStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming corpus pipeline's end-state law (r18 VERDICT item 5):
  * replaying the corpus in micro-batches through
  * [[StreamingPipe.runOnce]] — delta pairs → frontier assignment →
  * keeper re-election, all against MergeWriter state — must land on
  * EXACTLY the batch pipeline's election: same cluster PARTITION (as
  * doc-id sets; ids may differ by the stable-old-root rule) and the
  * SAME KEEPER SET (election depends on partition + quality only).
  * Plus re-delivery idempotence: re-running the drained stream, and
  * re-delivering an already-processed arrival file, change nothing.
  */
class StreamingPipeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-streampipe")
  private val sf = "/root/testdata/sf0.001"

  test("streamed arrival in 3 interleaved batches ≡ batch pipeline election; re-delivery is a no-op") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-streampipe")
    val src = base.resolve("src").toString
    val ckpt = base.resolve("ckpt").toString
    val state = base.resolve("state").toString
    Files.createDirectories(java.nio.file.Paths.get(src))

    // three arrival files, doc_id % 3 — deliberately interleaved so
    // small ids keep arriving in LATER batches and the old-root-wins
    // stable-id rule is exercised, not vacuous
    val docs = Tables.documents(spark, sf).select($"doc_id")
    for (b <- 0 to 2)
      docs.filter(pmod($"doc_id", lit(3)) === b)
        .coalesce(1).write.mode("append").parquet(src)

    StreamingPipe.runOnce(spark, src, ckpt, state, sf)

    val asg = MergeWriter.readSnapshot(spark, StreamingPipe.asgDir(state),
      StreamingPipe.asgSchema)
    val keepers = MergeWriter.readSnapshot(spark, StreamingPipe.keeperDir(state),
      StreamingPipe.keeperSchema)

    // 1. every document arrived exactly once
    assert(asg.count() == docs.count(), "assignment must cover the corpus")
    assert(asg.select($"doc_id").distinct().count() == asg.count())

    // 2. partition equality vs the batch assignment at DedupTau: the
    //    set of clusters-as-doc-id-sets must match (ids may differ)
    def partition(df: org.apache.spark.sql.DataFrame,
        idCol: String, compCol: String): Set[Seq[Long]] =
      df.groupBy(col(compCol))
        .agg(sort_array(collect_list(col(idCol))).as("members"))
        .select($"members").collect()
        .map(_.getSeq[Long](0).toSeq).toSet
    val batchAsg = Cluster.assignFrame(spark, sf, Pipe.DedupTau)
    assert(partition(asg, "doc_id", "comp") ==
      partition(batchAsg, "doc_id", "cluster_id"),
      "streamed cluster partition must equal the batch partition")

    // 3. keeper SET equality vs the batch pipeline's survivor-scoped
    //    election (re-derived here with the registered stage builds —
    //    the PipeSpec conservation discipline)
    val gate = TextStats.defs("txt_gopher_gate").build(spark, sf)
      .filter($"keep").select($"doc_id")
    val decon = TextStats.defs("txt_decontaminate").build(spark, sf)
      .filter(!$"contaminated").select($"doc_id")
    val qual = TextStats.defs("txt_quality_score").build(spark, sf)
      .select($"doc_id", $"quality")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id").orderBy($"quality".desc, $"doc_id".asc)
    val batchKeepers = gate.join(decon, "doc_id").join(batchAsg, "doc_id")
      .join(qual, "doc_id")
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val streamedKeepers = keepers.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(streamedKeepers == batchKeepers,
      s"streamed keeper set must equal the batch election " +
        s"(streamed ${streamedKeepers.size}, batch ${batchKeepers.size}, " +
        s"diff ${(streamedKeepers diff batchKeepers).take(5)} / " +
        s"${(batchKeepers diff streamedKeepers).take(5)})")
    // no keeper row for a dead (absorbed) cluster id survived the cascade
    val liveComps = asg.select($"comp").distinct()
    assert(keepers.join(liveComps, $"cluster_id" === $"comp", "left_anti")
      .count() == 0, "keeper table holds a cluster id no doc carries")

    // 4. drained-stream rerun: nothing changes
    val kBefore = MergeWriter.currentVersion(StreamingPipe.keeperDir(state))
    StreamingPipe.runOnce(spark, src, ckpt, state, sf)
    assert(MergeWriter.currentVersion(StreamingPipe.keeperDir(state)) == kBefore,
      "rerun with no new files must not reprocess")

    // 5. re-DELIVERY (same doc_ids in a NEW file): content no-op — the
    //    anti-join guard drops every already-assigned doc
    docs.filter(pmod($"doc_id", lit(3)) === 1)
      .coalesce(1).write.mode("append").parquet(src)
    StreamingPipe.runOnce(spark, src, ckpt, state, sf)
    val asgAfter = MergeWriter.readSnapshot(spark, StreamingPipe.asgDir(state),
      StreamingPipe.asgSchema)
    val keepersAfter = MergeWriter.readSnapshot(spark,
      StreamingPipe.keeperDir(state), StreamingPipe.keeperSchema)
    assert(partition(asgAfter, "doc_id", "comp") ==
      partition(asg, "doc_id", "comp"), "re-delivery must not move clusters")
    assert(keepersAfter.select($"doc_id").collect().map(_.getLong(0)).toSet ==
      streamedKeepers, "re-delivery must not change the keeper set")

    // 6. WIDE-BATCH fallback (r19 finding #5): maxFreshIds = 1 forces
    //    every batch onto the join-based delta path (no driver id
    //    collect) — the end state must be IDENTICAL to the IN-list
    //    drain above
    val state2 = base.resolve("state2").toString
    val ckpt2 = base.resolve("ckpt2").toString
    StreamingPipe.runOnce(spark, src, ckpt2, state2, sf, maxFreshIds = 1)
    val asg2 = MergeWriter.readSnapshot(spark, StreamingPipe.asgDir(state2),
      StreamingPipe.asgSchema)
    val keepers2 = MergeWriter.readSnapshot(spark,
      StreamingPipe.keeperDir(state2), StreamingPipe.keeperSchema)
    assert(partition(asg2, "doc_id", "comp") ==
      partition(asgAfter, "doc_id", "comp"),
      "join-path drain diverged from IN-list drain on cluster partition")
    assert(keepers2.select($"doc_id").collect().map(_.getLong(0)).toSet ==
      streamedKeepers,
      "join-path drain diverged from IN-list drain on the keeper set")
  }
}
