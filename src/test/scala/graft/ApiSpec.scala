package graft

import java.nio.file.Files
import graft.etl.{Api, Catalog}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout proof for the Api routes (VERDICT r1 item 4): the
  * messages table is bucketed on room_id, so `messagesPage` must scan a
  * strict SUBSET of the table's files (the room's bucket) while
  * returning exactly the rows a full scan would. */
class ApiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-api")

  private def messages(rows: Seq[(String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.map { case (eid, room, ts) =>
      (md5Hex(eid), eid, room, s"@u$room", """{"k":1}""", "m.room.message",
        ts, false, null.asInstanceOf[String], null.asInstanceOf[String],
        new java.sql.Timestamp(0L))
    }.toDF("id", "event_id", "room_id", "sender", "content", "event_type",
      "timestamp", "is_encrypted", "relates_to", "error", "processed_at")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("messagesPage scans only the room's bucket files; results match a full scan") {
    val cat = Catalog(Files.createTempDirectory("graft-api").toString)
    cat.bootstrap()
    val rows = for {
      r <- 0 until 12
      i <- 0 until 20
    } yield (s"e$r-$i", s"room$r", 1000L + i)
    cat.upsert(spark, "messages", messages(rows),
      Seq("event_id"), Seq("timestamp", "id"))

    val api = Api(cat)
    val page = api.messagesPage(spark, "room3", before = Some(1015L), limit = 5)
    val allFiles = cat.read(spark, "messages").inputFiles.toSet
    val pageFiles = page.inputFiles.toSet
    assert(pageFiles.subsetOf(allFiles))
    assert(pageFiles.size < allFiles.size,
      s"pruned scan must read fewer files (${pageFiles.size} vs ${allFiles.size})")

    // correctness: identical to the unpruned plan
    val expected = cat.read(spark, "messages")
      .filter(col("room_id") === "room3" && col("timestamp") < 1015L)
      .orderBy(col("timestamp").desc, col("event_id").desc).limit(5)
      .select("event_id", "timestamp").collect().map(r => (r.getString(0), r.getLong(1)))
    val got = page.select("event_id", "timestamp").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    assert(got.length == 5)
  }

  test("keyset pagination property: successive pages concatenate to the full sorted prefix, even across timestamp ties") {
    val cat = Catalog(Files.createTempDirectory("graft-api3").toString)
    cat.bootstrap()
    // 30 messages where every timestamp is shared by 3 events — the tie
    // case the reference's timestamp-only cursor silently skips when a
    // tie straddles a page break (limit 7 guarantees mid-tie breaks)
    val rows = (0 until 30).map(i => (s"e-$i", "room0", 1000L + i / 3))
    cat.upsert(spark, "messages", messages(rows), Seq("event_id"), Seq("timestamp", "id"))
    val api = Api(cat)

    val full = cat.read(spark, "messages")
      .orderBy(col("timestamp").desc, col("event_id").desc)
      .select("event_id", "timestamp").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

    var cursor: Option[(Long, String)] = None
    var pages = Seq.empty[(String, Long)]
    var done = false
    while (!done) {
      val page = api.messagesPage(spark, "room0",
        before = cursor.map(_._1), limit = 7, beforeEvent = cursor.map(_._2))
        .select("event_id", "timestamp").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      pages ++= page
      if (page.size < 7) done = true
      else cursor = Some((page.last._2, page.last._1))
    }
    assert(pages == full, "pages must concatenate to the sorted whole — no skips, no dupes")

    // and the reference's ts-only cursor really does lose the tied rows
    // (documented behavior parity, not a bug in our engine): page 1 ends
    // mid-tie at full(6); full(7) shares its timestamp, so a ts-only
    // next page (timestamp < boundary) can never return it
    assert(full(7)._2 == full(6)._2, "fixture must tie across the page break")
    val nextTsOnly = api.messagesPage(spark, "room0", before = Some(full(6)._2), limit = 7)
      .select("event_id").collect().map(_.getString(0)).toSet
    assert(!nextTsOnly.contains(full(7)._1),
      "ts-only cursor skips boundary ties by construction")
  }

  test("manifest zone maps: a time-bounded page opens only segments whose [min,max] can match the cursor") {
    import scala.jdk.CollectionConverters._
    val cat = Catalog(Files.createTempDirectory("graft-api4").toString)
    cat.bootstrap()
    // seed epoch (ts 1000-1009 per room), then two later append epochs
    // for room3 — each lands as its OWN segment in room3's bucket, the
    // thousands-of-segments-between-compactions shape at 100 TB
    val seed = for { r <- 0 until 4; i <- 0 until 10 } yield (s"a$r-$i", s"room$r", 1000L + i)
    cat.upsert(spark, "messages", messages(seed), Seq("event_id"), Seq("timestamp", "id"))
    cat.append(spark, "messages",
      messages((0 until 10).map(i => (s"b-$i", "room3", 2000L + i))))
    cat.append(spark, "messages",
      messages((0 until 10).map(i => (s"c-$i", "room3", 3000L + i))))

    val dir = cat.dir("messages")
    val bucket = graft.etl.MergeWriter.bucketIdOf("room3",
      cat.bucketOf("messages").get.buckets)
    val inBucket = graft.etl.MergeWriter.manifestFull(dir).filter(_.bucket == bucket)
    assert(inBucket.size == 3, s"room3's bucket must hold 3 segments: $inBucket")
    assert(inBucket.forall(e => e.min.isDefined && e.max.isDefined),
      s"every commit must record footer-stat zone maps: $inBucket")

    val api = Api(cat)
    def readCount(before: Option[Long]): (Int, Set[String]) = {
      graft.etl.MergeWriter.readLog.clear()
      val page = api.messagesPage(spark, "room3", before = before, limit = 50)
      val rels = graft.etl.MergeWriter.readLog.asScala.toSeq
        .filter(_._1 == dir).flatMap(_._2)
      (rels.size, page.select("event_id").collect().map(_.getString(0)).toSet)
    }
    // cursor below epoch 2: only the seed segment is opened
    val (n1, got1) = readCount(Some(1500L))
    assert(n1 == 1, s"bound 1500 must prune room3's bucket to 1 segment, read $n1")
    assert(got1 == (0 until 10).map(i => s"a3-$i").toSet)
    // cursor below epoch 3: two segments
    val (n2, got2) = readCount(Some(2500L))
    assert(n2 == 2, s"bound 2500 must prune to 2 segments, read $n2")
    assert(got2 == ((0 until 10).map(i => s"a3-$i") ++
      (0 until 10).map(i => s"b-$i")).toSet)
    // no cursor: all three (pruning is strictly the bound's doing)
    val (n3, got3) = readCount(None)
    assert(n3 == 3 && got3.size == 30)
  }

  test("an incremental 1-room upsert leaves other rooms' bucket files untouched and pages correctly") {
    val cat = Catalog(Files.createTempDirectory("graft-api2").toString)
    cat.bootstrap()
    val seed = for { r <- 0 until 12; i <- 0 until 5 } yield (s"e$r-$i", s"room$r", 100L + i)
    cat.upsert(spark, "messages", messages(seed), Seq("event_id"), Seq("timestamp", "id"))
    val before = graft.etl.MergeWriter.manifestEntries(cat.dir("messages")).toMap

    cat.upsert(spark, "messages", messages(Seq(("e3-99", "room3", 999L))),
      Seq("event_id"), Seq("timestamp", "id"))
    val after = graft.etl.MergeWriter.manifestEntries(cat.dir("messages")).toMap
    val touched = graft.etl.MergeWriter.bucketIdOf("room3",
      cat.bucketOf("messages").get.buckets)
    before.foreach { case (b, p) =>
      if (b != touched) assert(after(b) == p, s"bucket $b rewritten by unrelated upsert")
    }

    val api = Api(cat)
    val top = api.messagesPage(spark, "room3", limit = 1)
      .select("event_id").collect().map(_.getString(0))
    assert(top.toSeq == Seq("e3-99"), "new message must lead the page")
  }
}
