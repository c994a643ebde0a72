package graft

import java.nio.file.Files
import graft.etl.{Api, Catalog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Randomized equivalence properties for the manifest zone-map pruned
  * reads (SURVEY §4 storage layer).
  *
  * The existing CatalogSpec cases pin segment-OPEN counts on friendly,
  * time-ordered layouts — they prove pruning HAPPENS. These properties
  * pin the other direction on adversarial layouts: pruning must never
  * change an answer. A wrong manifest min/max, an off-by-one in the
  * tail bound derivation (readTailByStats), or an exclusive-vs-
  * inclusive slip in the range intersection would silently DROP rows —
  * the worst failure mode a storage layer has, invisible to open-count
  * assertions. Layouts here are what a real backfilling / out-of-order
  * stream produces: segments with overlapping timestamp ranges, heavy
  * ties (tiny ts domain), duplicates on the page boundary, and page
  * sizes straddling every edge (1, mid, exactly-all, beyond-all).
  */
class PrunedReadPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-prune-prop")

  test("tail read equals the full-scan tail on overlapping, tie-heavy append layouts") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val cat = Catalog(Files.createTempDirectory(s"graft-prune-tail$seed").toString)
      cat.bootstrap()
      // epochs are NOT time-ordered: each draws from the same tiny ts
      // domain, so segment [min,max] ranges overlap heavily and the
      // manifest bound must be derived, not assumed from append order
      val all = ArrayBuffer[(Long, String)]()
      val epochs = 2 + rnd.nextInt(4)
      for (k <- 1 to epochs) {
        val n = 1 + rnd.nextInt(40)
        val rows = (1 to n).map(i => (rnd.nextInt(60).toLong, f"m$seed%02d-$k-$i%03d"))
        all ++= rows
        cat.append(spark, "logs",
          rows.map { case (ts, m) => (new java.sql.Timestamp(ts), "info", m) }
            .toDF("timestamp", "level", "message"))
      }
      val api = Api(cat)
      // logsTail's order (timestamp desc, message) is total here because
      // messages are unique — exact sequence compare, not just counts
      val ordered = all.sortBy { case (ts, m) => (-ts, m) }
      for (limit <- Seq(1, 3, 17, all.size, all.size + 20)) {
        val got = api.logsTail(spark, limit)
          .select("timestamp", "message").collect()
          .map(r => (r.getTimestamp(0).getTime, r.getString(1))).toSeq
        assert(got == ordered.take(limit),
          s"seed=$seed limit=$limit: pruned tail diverged from full-scan tail")
      }
    }
  }

  test("bucket+zone ranged point read equals the full-scan filter on random layouts") {
    import spark.implicits._
    def msgs(rows: Seq[(String, String, Long)]) =
      rows.map { case (eid, room, ts) =>
        (eid, eid, room, "@u:x", "{}", "m.room.message", ts, false,
          null.asInstanceOf[String], null.asInstanceOf[String],
          new java.sql.Timestamp(0L))
      }.toDF("id", "event_id", "room_id", "sender", "content", "event_type",
        "timestamp", "is_encrypted", "relates_to", "error", "processed_at")
    for (seed <- 1 to 3) {
      val rnd = new Random(100 + seed)
      val cat = Catalog(Files.createTempDirectory(s"graft-prune-key$seed").toString)
      cat.bootstrap()
      val rooms = (0 until 5).map(r => s"!room$r:x")
      var eid = 0
      val all = ArrayBuffer[(String, String, Long)]()
      for (_ <- 1 to 4) { // 4 merge batches → stacked segments per bucket
        val batch = (1 to 1 + rnd.nextInt(25)).map { _ =>
          eid += 1
          (s"e$seed-$eid", rooms(rnd.nextInt(rooms.size)), rnd.nextInt(60).toLong)
        }
        all ++= batch
        cat.upsert(spark, "messages", msgs(batch),
          Seq("event_id"), Seq("timestamp", "id"))
      }
      for (trial <- 1 to 8) {
        val room = rooms(rnd.nextInt(rooms.size))
        val lo = if (rnd.nextBoolean()) Some(rnd.nextInt(60).toLong) else None
        val hi = if (rnd.nextBoolean()) Some(rnd.nextInt(60).toLong) else None
        // the pruned read + the caller's row-level predicate (the
        // contract: pruning only drops provably-disjoint segments)
        val got = cat.readForKey(spark, "messages", room, lo, hi)
          .filter(col("room_id") === room &&
            lo.fold(lit(true))(col("timestamp") >= _) &&
            hi.fold(lit(true))(col("timestamp") <= _))
          .select("event_id").collect().map(_.getString(0)).toSet
        val exp = all.filter { case (_, r, ts) =>
          r == room && lo.forall(ts >= _) && hi.forall(ts <= _)
        }.map(_._1).toSet
        assert(got == exp,
          s"seed=$seed trial=$trial room=$room range=[$lo,$hi]: " +
            s"pruned read lost ${exp -- got} / invented ${got -- exp}")
      }
    }
  }
}
