package graft

import java.nio.file.Files
import graft.etl.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSON-lines source boundary (FIXTURES.md A1): well-formed events parse
  * to the raw-event schema; malformed lines and objects missing identity
  * fields become quarantine rows (error = the offending line) instead of
  * failing the batch; the same parse path runs under readStream. */
class JsonSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-jsonl")

  private val good =
    """{"event_id":"$e1:x","room_id":"!r1:x","sender":"@a:x","event_type":"m.room.message","origin_server_ts":1000,"content":"{\"body\":\"hi\"}","relates_to":null,"is_encrypted":false,"to_start_of_timeline":false,"error":null}"""
  private val member =
    """{"event_id":"$e2:x","room_id":"!r1:x","sender":"@a:x","event_type":"m.room.member","origin_server_ts":1001,"content":"{\"membership\":\"join\"}","is_encrypted":false,"to_start_of_timeline":false}"""
  private val backfill =
    """{"event_id":"$e3:x","room_id":"!r1:x","sender":"@a:x","event_type":"m.room.message","origin_server_ts":900,"content":"{}","is_encrypted":false,"to_start_of_timeline":true}"""
  private val noFlag = // to_start_of_timeline absent: must read as live, not drop
    """{"event_id":"$e4:x","room_id":"!r1:x","sender":"@b:x","event_type":"m.room.message","origin_server_ts":1002,"content":"{}","is_encrypted":false}"""
  private val malformed = """{"event_id": "$broken" this is not json"""
  private val missingId = """{"room_id":"!r1:x","event_type":"m.room.message"}"""

  test("batch: parse, quarantine corrupt lines, feed the T1-T3 pipeline") {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.write(dir.resolve("events.jsonl"),
      Seq(good, member, backfill, noFlag, malformed, missingId)
        .mkString("\n").getBytes)

    val raw = Ingest.rawFromJsonLines(spark.read.text(dir.toString))
    val (clean, corrupt) = Ingest.quarantine(raw)

    assert(corrupt.count() == 2, "malformed + missing-identity lines quarantined")
    val errs = corrupt.select("error").collect().map(_.getString(0)).toSet
    assert(errs == Set(malformed, missingId), "error carries the offending line verbatim")
    assert(corrupt.filter(col("event_id").startsWith("$corrupt-")).count() == 2,
      "synthetic identity so downstream merges never collide on null")

    // the clean side flows through the steady-state message path:
    // backfill dropped (T1), member filtered (T2), 2 messages survive
    val msgs = Ingest.messagesFromRaw(clean)
    val got = msgs.select("event_id", "timestamp").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("$e1:x", 1000L), ("$e4:x", 1002L)),
      s"absent to_start_of_timeline must count as live, got $got")
  }

  test("full JSONL ingest stream: messages merged, corrupt line lands in logs, resume re-reads nothing") {
    import graft.etl.{Catalog, Pipeline, Streaming}
    val root = Files.createTempDirectory("graft-jsonl-e2e")
    val src = root.resolve("src"); val ckpt = root.resolve("ckpt")
    Files.createDirectories(src)
    val cat = Catalog(root.resolve("cat").toString)
    cat.bootstrap()
    val pipe = Pipeline(cat)

    Files.write(src.resolve("b1.jsonl"),
      Seq(good, member, backfill, malformed).mkString("\n").getBytes)
    Streaming.startFullIngestJsonl(spark, src.toString, ckpt.toString, pipe)
      .awaitTermination()
    assert(cat.read(spark, "messages").count() == 1, "one live message merged")
    val logged = cat.read(spark, "logs").select("message").collect().map(_.getString(0))
    assert(logged.exists(_.contains("this is not json")),
      "the corrupt line must be queryable in logs, not silently dropped")

    // second file; checkpoint resume processes ONLY it
    Files.write(src.resolve("b2.jsonl"), noFlag.getBytes)
    Streaming.startFullIngestJsonl(spark, src.toString, ckpt.toString, pipe)
      .awaitTermination()
    assert(cat.read(spark, "messages").count() == 2, "resume adds only the new file's row")
    assert(cat.read(spark, "logs").count() == 1, "no duplicate dead letters on resume")
  }

  test("property: any schema-valid event round-trips through to_json -> rawFromJsonLines") {
    import spark.implicits._
    // adversarial field content: quotes, backslashes, unicode, JSON-in-
    // string, embedded newline (escaped by to_json, so still one line)
    val nasty = Seq("""say "hi"""", """back\slash""", "emoji ☃ snow",
      """{"nested":"json"}""", "line1\nline2", null)
    val rows = nasty.zipWithIndex.map { case (content, i) =>
      (s"$$e$i:x", s"!r${i % 2}:x", s"@u$i:x", "m.room.message",
        1000L + i, content, if (i % 2 == 0) """{"rel_type":"m.replace"}""" else null,
        i % 3 == 0, false, null.asInstanceOf[String])
    }
    val df = rows.toDF(etl.Schemas.rawEvent.fieldNames.toSeq: _*)
    val lines = df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    val back = etl.Ingest.rawFromJsonLines(lines)
    assert(back.filter(col("event_type") === "m.graft.corrupt").count() == 0,
      "every generated event is schema-valid")
    val orig = df.collect().map(_.toSeq).toSet
    val got = back.select(df.columns.map(col): _*).collect().map(_.toSeq).toSet
    assert(got == orig, s"round-trip must be lossless:\n${(orig -- got).mkString("\n")}")
  }

  test("streaming: the same parse path runs under readStream") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val raw = Ingest.rawFromJsonLines(ms.toDF())
    val q = Ingest.messagesFromRaw(raw.filter(col("error").isNull))
      .writeStream.format("memory").queryName("jsonl_out")
      .outputMode("append").start()
    try {
      ms.addData(good, malformed, backfill)
      q.processAllAvailable()
      val out = spark.table("jsonl_out").select("event_id").as[String].collect()
      assert(out.toSeq == Seq("$e1:x"),
        "one live message; corrupt + backfill never reach the sink")
    } finally q.stop()
  }
}
