package graft

import java.nio.file.{Files, Paths}
import graft.etl.{Ingest, MergeWriter, Schemas, Streaming}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5 item 5: streaming micro-batches with out-of-order replay;
  * checkpoint resume ≡ sync-token resume (S5/S7/L8); effectively-once. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-stream")

  private def rawRows(ids: Range, tsBase: Long, backfill: Boolean = false): DataFrame = {
    val rows = ids.map { i =>
      Row(s"$$evt$i:x", s"!room${i % 3}:x", s"@u${i % 5}:x", "m.room.message",
        tsBase + i, s"""{"msgtype":"m.text","body":"m$i"}""",
        null, false, backfill, null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.rawEvent)
  }

  test("ingest stream: filters, projection, merge, checkpoint resume") {
    val base = Files.createTempDirectory("graft-stream")
    val src = base.resolve("src").toString
    val ckpt = base.resolve("ckpt").toString
    val table = base.resolve("messages").toString
    Files.createDirectories(Paths.get(src))

    // chunk 1: 20 messages + 5 backfill rows (must be dropped, T1)
    rawRows(0 until 20, 1000L).write.mode("append").parquet(src)
    rawRows(100 until 105, 50L, backfill = true).write.mode("append").parquet(src)
    Streaming.runOnce(spark, src, ckpt, table)
    val after1 = MergeWriter.readSnapshot(spark, table, Schemas.messages)
    assert(after1.count() == 20, "backfill rows must be filtered out")

    // chunk 2: 10 new + 5 duplicate event_ids (late replays — upsert wins once)
    rawRows(20 until 30, 2000L).write.mode("append").parquet(src)
    rawRows(0 until 5, 3000L).write.mode("append").parquet(src)
    Streaming.runOnce(spark, src, ckpt, table)
    val after2 = MergeWriter.readSnapshot(spark, table, Schemas.messages)
    assert(after2.count() == 30, "duplicates must merge, not append")
    // the replayed duplicates carry the newer timestamp (LWW)
    import org.apache.spark.sql.functions._
    val e0ts = after2.filter(col("event_id") === "$evt0:x")
      .select("timestamp").collect()(0).getLong(0)
    assert(e0ts == 3000L)

    // restart with same checkpoint and no new files: nothing reprocessed
    val vBefore = MergeWriter.currentVersion(table)
    Streaming.runOnce(spark, src, ckpt, table)
    assert(MergeWriter.currentVersion(table) == vBefore,
      "checkpoint resume must not re-merge old files")
  }

  test("quarantine split routes error rows") {
    val raw = rawRows(0 until 10, 0L)
    val msgs = Ingest.messagesFromRaw(raw)
    import org.apache.spark.sql.functions._
    val withErr = msgs.withColumn("error",
      when(col("event_id") === "$evt3:x", "decrypt_failed"))
    val (clean, quarantined) = Ingest.quarantine(withErr)
    assert(clean.count() == 9 && quarantined.count() == 1)
  }
}
