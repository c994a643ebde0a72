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
}
