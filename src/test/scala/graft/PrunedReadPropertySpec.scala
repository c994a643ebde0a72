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
      // alternate a moderate-tie domain with a BRUTAL-tie domain (6
      // distinct values): the brutal case forces segment max == derived
      // bound collisions, where an exclusive-vs-inclusive slip in the
      // bound comparison drops exactly the rows tied on the cutoff —
      // a mutation proof showed the moderate domain alone misses it
      // (PLANS.md §prune-gate red/green)
      val tsDomain = if (seed % 2 == 0) 60 else 6
      val all = ArrayBuffer[(Long, String)]()
      val epochs = 2 + rnd.nextInt(4)
      for (k <- 1 to epochs) {
        val n = 1 + rnd.nextInt(40)
        val rows = (1 to n).map(i => (rnd.nextInt(tsDomain).toLong, f"m$seed%02d-$k-$i%03d"))
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

  test("tail read keeps segments whose max EQUALS the derived bound (constructed boundary tie)") {
    // readTailByStats derives L = min over the prefix of segment mins
    // and may only drop segments with max < L — max == L must be KEPT:
    // when the page cutoff lands exactly on L, tied rows in such a
    // segment can win the message tiebreak. Constructed so randomness
    // isn't needed (a mutation proof showed random layouts rarely
    // compose max == L with a tie-straddling page):
    //   segment A: ts=5 × {z1,z2,z3}  → prefix for limit=3, L = 5
    //   segment B: ts=5 × {a1,a2}     → max == L, holds the WINNING ties
    // correct 3-row tail (ts desc, message asc) = a1, a2, z1; an
    // exclusive bound drops B (and A) and returns the wrong page.
    import spark.implicits._
    val cat = Catalog(Files.createTempDirectory("graft-prune-boundary").toString)
    cat.bootstrap()
    def seg(msgs: Seq[String]) = cat.append(spark, "logs",
      msgs.map(m => (new java.sql.Timestamp(5L), "info", m))
        .toDF("timestamp", "level", "message"))
    seg(Seq("z1", "z2", "z3"))
    seg(Seq("a1", "a2"))
    val got = Api(cat).logsTail(spark, 3)
      .select("message").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a1", "a2", "z1"),
      "rows tied on the boundary timestamp must come from EVERY segment whose max reaches it")
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
