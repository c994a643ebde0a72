package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r22 json_tuple single-parse in Ingest.projectParticipant
  * against the get_json_object calls it replaced: for top-level `$.k`
  * extraction the two must agree on every value shape the member
  * projection can meet — strings (plain, escaped, unicode), JSON null,
  * numbers, booleans, nested objects/arrays (returned as JSON text),
  * missing keys, non-object roots, and malformed JSON. */
class IngestJsonSpec extends AnyFunSuite {

  test("json_tuple(k) ≡ get_json_object($.k) on every relevant value shape") {
    val spark = Sessions.local(cores = 2, appName = "ingest-json-spec")
    try {
      import spark.implicits._
      val docs = Seq(
        """{"membership":"join","displayname":"Ana","avatar_url":"mxc://x"}""",
        """{"membership":"join","displayname":""}""",
        """{"displayname":null,"membership":"leave"}""",
        """{"displayname":42,"membership":true}""",
        """{"displayname":{"a":1,"b":[2,3]},"membership":[1,2]}""",
        """{"displayname":"quote \" backslash \\ newline \n tab \t"}""",
        """{"displayname":"unicode é ‎ surrogate 😀"}""",
        """{"displayname":"@imp:x","membership":"join"}""",
        """{"other":"keys","only":1}""",
        """"a bare string"""",
        """[1,2,3]""",
        """not json at all""",
        """{"displayname":"trailing",""",
        """{}""",
        null.asInstanceOf[String],
        """{"displayname":1.5e10,"membership":0.25}""")
      val df = docs.toDF("content")
      val both = df.select(
        get_json_object($"content", "$.membership").as("g_m"),
        get_json_object($"content", "$.displayname").as("g_d"),
        get_json_object($"content", "$.avatar_url").as("g_a"),
        json_tuple($"content", "membership", "displayname", "avatar_url")
          .as(Seq("t_m", "t_d", "t_a")))
      both.collect().foreach { r =>
        assert(r.get(0) == r.get(3), s"membership: $r")
        assert(r.get(1) == r.get(4), s"displayname: $r")
        assert(r.get(2) == r.get(5), s"avatar_url: $r")
      }
    } finally spark.stop()
  }
}
