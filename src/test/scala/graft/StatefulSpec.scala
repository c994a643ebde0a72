package graft

import graft.etl.Stateful
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState first-seen dedup: duplicates inside a batch
  * and across batches (including across a processAllAvailable boundary,
  * i.e. persisted state) must be suppressed. */
class StatefulSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-state")

  test("streaming first-seen dedup across micro-batches") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Int)]
    // deterministic within-batch survivor: smallest payload wins
    val out = Stateful.dedupFirstSeen[(String, Int)](ms.toDS(), _._1,
      (a, b) => if (a._2 <= b._2) a else b)
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(("a", 1), ("b", 2), ("a", 3))
      q.processAllAvailable()
      val after1 = spark.table("dedup_out").as[(String, Int)].collect()
      assert(after1.sorted.toSeq == Seq(("a", 1), ("b", 2)),
        "within-batch duplicate suppressed, deterministic survivor")

      ms.addData(("a", 4), ("c", 5))
      q.processAllAvailable()
      val after2 = spark.table("dedup_out").as[(String, Int)].collect()
      assert(after2.map(_._1).sorted.toSeq == Seq("a", "b", "c"),
        "cross-batch duplicate suppressed by state")
    } finally q.stop()
  }

  test("event-time TTL dedup expires cold keys as the watermark passes the horizon") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // event time drives everything: deterministic under replay, no
    // wall-clock sleeps (a processing-time TTL can't be tested without
    // a manual clock, and isn't replay-deterministic anyway)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ms = MemoryStream[(String, Int, java.sql.Timestamp)]
    val withWm = ms.toDS().withWatermark("_3", "0 seconds")
    val out = Stateful.dedupFirstSeenTtl[(String, Int, java.sql.Timestamp)](
      withWm, _._1, (a, b) => if (a._2 <= b._2) a else b,
      eventTimeMs = _._3.getTime, ttlMs = 5000L)
    val q = out.writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    try {
      ms.addData(("a", 1, ts(10)))
      q.processAllAvailable() // a emitted; timeout armed at t=15s
      ms.addData(("a", 2, ts(11)))
      q.processAllAvailable() // in-horizon duplicate suppressed; re-armed to 16s
      ms.addData(("x", 9, ts(30)))
      q.processAllAvailable() // watermark advances to 30s after this batch
      ms.addData(("y", 8, ts(40)))
      q.processAllAvailable() // wm 30s > 16s: a's state expires this batch
      ms.addData(("a", 3, ts(50)))
      q.processAllAvailable() // past the horizon: a re-admitted as new
      val fin = spark.table("dedup_ttl_out")
        .as[(String, Int, java.sql.Timestamp)].collect().map(r => (r._1, r._2)).toSeq
      assert(fin.sorted == Seq(("a", 1), ("a", 3), ("x", 9), ("y", 8)).sorted,
        s"in-horizon dup suppressed, expired key re-admitted, got $fin")
    } finally q.stop()
  }
}
