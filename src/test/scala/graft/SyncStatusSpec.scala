package graft

import java.nio.file.Files
import graft.etl.{Streaming, SyncStatus}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SyncStatusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-status")

  test("listener captures started/progress/terminated for an ingest run") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-status")
    val src = base.resolve("src").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("$e1:x", "!r:x", "@u:x", "m.room.message",
          1L, "{}", null, false, false, null)), 1),
      etl.Schemas.rawEvent).write.parquet(src)

    val status = new SyncStatus().attach(spark)
    try {
      Streaming.runOnce(spark, src, base.resolve("ckpt").toString,
        base.resolve("messages").toString)
      // listener events are delivered asynchronously
      val deadline = System.nanoTime() + 10_000_000_000L
      var statuses = Set.empty[String]
      while (System.nanoTime() < deadline && !statuses("terminated")) {
        statuses = statuses ++ status.drain(spark)
          .select("status").as[String].collect()
        if (!statuses("terminated")) Thread.sleep(100)
      }
      assert(Set("started", "progress", "terminated").subsetOf(statuses),
        s"got $statuses")
    } finally status.detach(spark)
  }
}
