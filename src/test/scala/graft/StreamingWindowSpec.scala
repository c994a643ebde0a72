package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming aggregation: watermarked tumbling windows over a
  * file-source stream, checked against the identical batch plan
  * (streaming=batch parity is the point of Structured Streaming).
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-swin")

  test("watermarked tumbling window counts match the batch plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-swin")
    val src = dir.resolve("src").toString
    val ckpt = dir.resolve("ckpt").toString

    val events = (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(3600_000L * (i % 5) + i), s"t${i % 3}", i / 10.0)
    }.toDF("event_id", "ts", "event_type", "value")
    events.write.parquet(src)

    val stream = spark.readStream.schema(events.schema).parquet(src)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("swin_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("swin_out")
      .select(unix_millis($"window.start").as("w"), $"event_type", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start").as("w"), $"event_type", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.size == 15) // 5 hour-buckets × 3 types
  }
}
