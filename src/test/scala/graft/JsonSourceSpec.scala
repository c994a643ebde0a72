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

  test("wrong-TYPE fields: silent PERMISSIVE nulls are quarantined, never merged as null identity") {
    // from_json is PERMISSIVE: a present-but-wrong-type field parses to
    // a silent null, not an error. For the four identity fields —
    // event_id, room_id, sender, origin_server_ts, the last two backing
    // NOT NULL columns of the reference's messages table
    // (schema.ts:60,63) — that null must route the line to quarantine,
    // or a null timestamp/sender would flow into the LWW merge where
    // the reference's insert would have rejected it.
    def ev(tsJson: String, senderJson: String = "\"@a:x\""): String =
      s"""{"event_id":"$$t:x","room_id":"!r1:x","sender":$senderJson,""" +
        s""""event_type":"m.room.message","origin_server_ts":$tsJson,""" +
        s""""content":"{}","is_encrypted":false,"to_start_of_timeline":false}"""
    val badLines = Seq(
      ev(tsJson = "\"not-a-number\""), // string where BIGINT expected
      ev(tsJson = "1000.5"),           // float token for a long field
      ev(tsJson = "null"),             // explicit null ts
      ev(tsJson = "1000", senderJson = "null"), // explicit null sender
      """[1,2,3]""",                   // valid JSON, not an object
      "\u0000\u0001 binary garbage")
    val okLine = ev(tsJson = "1000")
    val dir = Files.createTempDirectory("graft-jsonl-types")
    Files.write(dir.resolve("events.jsonl"),
      (badLines :+ okLine).mkString("\n").getBytes)

    val raw = Ingest.rawFromJsonLines(spark.read.text(dir.toString))
    val (clean, corrupt) = Ingest.quarantine(raw)
    assert(corrupt.count() == badLines.size,
      "every wrong-typed / non-object line must be quarantined")
    assert(corrupt.select("error").collect().map(_.getString(0)).toSet
      == badLines.toSet, "quarantine must carry each offending line verbatim")
    // the invariant the gate exists for: nothing reaching the messages
    // merge carries a null in a reference-NOT-NULL column
    val msgs = Ingest.messagesFromRaw(clean)
    assert(msgs.count() == 1)
    assert(msgs.filter(col("timestamp").isNull || col("sender").isNull
      || col("event_id").isNull || col("room_id").isNull).count() == 0,
      "no null identity may survive to the merge")
  }

  test("wrong-TYPE member/room state events: membership NOT NULL rule quarantines; room defaults mirror the reference") {
    // Same PERMISSIVE-null discipline as the message identity gate, now
    // on the L2/L3 inputs. participants.membership is TEXT NOT NULL and
    // the reference passes member.membership with no fallback
    // (schema.ts:45, db.utils.ts:93): a member event whose content
    // yields no membership is rejected by its insert — here it must
    // carry the in-row error and never reach the participants merge.
    // Rooms are the opposite case: every extracted room column is
    // nullable and the reference itself coalesces topic/avatar with
    // `?? ''` (db.utils.ts:110-114), so wrong-typed room content
    // DEFAULTS, identity problems quarantine at the source gate.
    def member(content: String, sender: String = "\"@a:x\"",
        eid: String = "\"$m1:x\""): String =
      s"""{"event_id":$eid,"room_id":"!r1:x","sender":$sender,""" +
        s""""event_type":"m.room.member","origin_server_ts":1001,""" +
        (if (content == null) "" else s""""content":$content,""") +
        s""""is_encrypted":false,"to_start_of_timeline":false}"""
    val badMembers = Seq(
      member("\"{\\\"displayname\\\":\\\"X\\\"}\"", eid = "\"$m2:x\""), // membership key absent
      member("\"{\\\"membership\\\":null}\"", eid = "\"$m3:x\""),       // explicit JSON null
      member("\"not json at all\"", eid = "\"$m4:x\""),                 // unparseable content
      member("\"[1,2,3]\"", eid = "\"$m5:x\""),                         // non-object content
      member(null, eid = "\"$m6:x\""))                                  // content field absent
    val okMember = member("\"{\\\"membership\\\":\\\"join\\\",\\\"displayname\\\":\\\"A\\\"}\"")
    // member.name fallback (matrix-js-sdk calculateDisplayName): a
    // falsy displayname — key absent OR empty string — resolves to the
    // USER ID, never to '' (the reference persists member.name, which
    // is already past that fallback)
    val okNoDisplay = member("\"{\\\"membership\\\":\\\"join\\\"}\"",
      sender = "\"@b:x\"", eid = "\"$m7:x\"")
    val okEmptyDisplay = member("\"{\\\"membership\\\":\\\"join\\\",\\\"displayname\\\":\\\"\\\"}\"",
      sender = "\"@c:x\"", eid = "\"$m8:x\"")
    // null sender on a member event: stopped at the SOURCE identity
    // gate, never reaches the member projection at all. (A wrong-TYPE
    // sender like 12345 is NOT a gate case: Spark's JSON parser
    // renders any token as text for string fields, exactly as pg's
    // TEXT coercion would accept it from the reference's insert.)
    val badIdentity = member("\"{\\\"membership\\\":\\\"join\\\"}\"", sender = "null")
    // room state events: wrong-typed name content must DEFAULT (""), not
    // quarantine — the reference coalesces; identity is already gated
    val roomNoName =
      """{"event_id":"$r1:x","room_id":"!r1:x","sender":"@a:x","event_type":"m.room.name","origin_server_ts":1002,"content":"[]","is_encrypted":false,"to_start_of_timeline":false}"""

    val dir = Files.createTempDirectory("graft-jsonl-member")
    Files.write(dir.resolve("events.jsonl"),
      (badMembers ++ Seq(okMember, okNoDisplay, okEmptyDisplay, badIdentity, roomNoName))
        .mkString("\n").getBytes)
    val raw = Ingest.rawFromJsonLines(spark.read.text(dir.toString))
    val (srcClean, srcCorrupt) = Ingest.quarantine(raw)
    assert(srcCorrupt.count() == 1, "wrong-typed sender dies at the source gate")

    val (okPart, badPart) = Ingest.quarantine(Ingest.projectParticipant(srcClean))
    assert(badPart.count() == badMembers.size,
      "every membership-less member event must carry the in-row error")
    assert(badPart.select("event_id").collect().map(_.getString(0)).toSet
      == Set("$m2:x", "$m3:x", "$m4:x", "$m5:x", "$m6:x"))
    val okRows = okPart.select("user_id", "membership", "display_name").collect()
    assert(okRows.map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      == Seq(("@a:x", "join", "A"), ("@b:x", "join", "@b:x"), ("@c:x", "join", "@c:x")),
      "only valid members survive, membership intact, falsy displayname → user_id")
    assert(okPart.filter(col("membership").isNull).count() == 0,
      "no null membership may survive to the L2 merge")

    val rooms = Ingest.projectRooms(srcClean)
    assert(rooms.select("room_id", "name").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(("!r1:x", "")),
      "wrong-typed room name content defaults to '' exactly like the reference")

    // end-to-end: the pipeline routes the bad member rows to logs and
    // merges only the valid participant
    import graft.etl.{Catalog, Pipeline}
    val root = Files.createTempDirectory("graft-member-gate")
    val cat = Catalog(root.resolve("cat").toString)
    cat.bootstrap()
    Pipeline(cat).applyBatch(spark, srcClean, batchId = 1L)
    val parts = cat.read(spark, "participants")
      .select("user_id", "room_id", "membership").collect()
    assert(parts.map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
      == Seq(("@a:x", "!r1:x", "join"), ("@b:x", "!r1:x", "join"), ("@c:x", "!r1:x", "join")))
    val logged = cat.read(spark, "logs").select("message").collect().map(_.getString(0))
    assert(logged.count(_.contains("member_missing_membership")) == badMembers.size,
      s"each rejected member event must be queryable in logs, got:\n${logged.mkString("\n")}")
  }

  test("member.name: non-string/hidden-char displaynames fall back; room-scoped duplicates disambiguate") {
    // matrix-js-sdk calculateDisplayName, beyond the falsy→userId rule:
    //  - typeof displayname !== 'string' → userId
    //  - empty after hidden-char stripping (zero-width etc.) → userId
    //  - several room members sharing a (stripped) name → each becomes
    //    "Name (user_id)"; the collision key is the STRIPPED name, the
    //    rendered base keeps everything but LRO/RLO direction overrides
    def member(sender: String, innerJson: String, eid: String,
        room: String = "!r1:x"): String = {
      val esc = innerJson.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"event_id":"$eid","room_id":"$room","sender":"$sender",""" +
        s""""event_type":"m.room.member","origin_server_ts":1001,""" +
        s""""content":"$esc","is_encrypted":false,"to_start_of_timeline":false}"""
    }
    def m(dnJson: String) = s"""{"membership":"join","displayname":$dnJson}"""
    val lines = Seq(
      member("@a:x", m("\"Dup\""), "$d1:x"),            // collides with @b and @zw
      member("@b:x", m("\"Dup\""), "$d2:x"),
      member("@zw:x", m("\"Dup\u200B\""), "$d3:x"),     // strips to "Dup" → collides; base keeps the ZWSP
      member("@num:x", m("42"), "$d4:x"),               // non-string number → userId
      member("@obj:x", m("""{"nested":1}"""), "$d5:x"), // non-string object → userId
      member("@hid:x", m("\"\u200B\u200C \""), "$d6:x"), // hidden-char-only → userId
      member("@self:x", m("\"@self:x\""), "$d7:x"),     // own mxid → userId, never disambiguated
      member("@dir:x", m("\"\u202Ename\u202D\""), "$d8:x"), // LRO/RLO stripped from the base AND force-disambiguated (LTR/RTL rule)
      member("@solo:x", m("\"Solo\""), "$d9:x"),        // unique name untouched
      member("@solo:x", m("\"Solo\""), "$da:x"),        // same USER twice: no self-collision
      member("@other:x", m("\"Solo\""), "$db:x", room = "!r2:x"), // same name, other room: no collision
      member("@imp:x", m("\"@alice:x\""), "$dc:x"),     // someone ELSE'S mxid as a name \u2192 forced (impersonation defense)
      member("@ltr:x", m("\"Bob\u200E\""), "$dd:x"),    // LTR mark \u2192 forced; the mark survives in the rendered base
      // composed U+00E9 vs decomposed e+U+0301: the SDK's cache key is
      // NFD-normalized BEFORE stripping, so these collide; each keeps
      // its own (un-normalized) byte form in the rendered base
      member("@jose1:x", m("\"Jos\u00E9\""), "$de:x"),
      member("@jose2:x", m("\"Jose\u0301\""), "$df:x"))
    val dir = Files.createTempDirectory("graft-jsonl-name")
    // explicit UTF-8: Java 17's default charset follows the locale, and
    // an ASCII default would silently mangle the hidden chars into '?'
    Files.write(dir.resolve("events.jsonl"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val raw = Ingest.rawFromJsonLines(spark.read.text(dir.toString))
    val (ok, bad) = Ingest.quarantine(Ingest.projectParticipant(raw))
    assert(bad.count() == 0, "all events carry a valid membership")
    val got = ok.select("user_id", "room_id", "display_name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("@a:x", "!r1:x", "Dup (@a:x)"),
      ("@b:x", "!r1:x", "Dup (@b:x)"),
      ("@zw:x", "!r1:x", "Dup\u200B (@zw:x)"),
      ("@num:x", "!r1:x", "@num:x"),
      ("@obj:x", "!r1:x", "@obj:x"),
      ("@hid:x", "!r1:x", "@hid:x"),
      ("@self:x", "!r1:x", "@self:x"),
      ("@dir:x", "!r1:x", "name (@dir:x)"),
      ("@solo:x", "!r1:x", "Solo"),
      ("@other:x", "!r2:x", "Solo"),
      ("@imp:x", "!r1:x", "@alice:x (@imp:x)"),
      ("@ltr:x", "!r1:x", "Bob‎ (@ltr:x)"),
      ("@jose1:x", "!r1:x", "Jos\u00E9 (@jose1:x)"),
      ("@jose2:x", "!r1:x", "Jose\u0301 (@jose2:x)")), s"got:\n${got.mkString("\n")}")
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
