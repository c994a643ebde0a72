package graft

import graft.etl.{Ingest, Schemas}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The roomState consult's key-recovery claim, property-tested: for
  * ANY raw displayname, rendering it through the real T4 projection
  * and then inverting the PERSISTED name with the production
  * [[Ingest.stateCollisionKeys]] must yield byte-for-byte the same
  * collision key the SDK would compute from the RAW name (NFD, then
  * hidden-char strip; falsy → the per-user sentinel).
  *
  * This is the property the scaladoc argues by cases ("a raw name
  * ending in ' (own-mxid)' contains an mxid-lookalike, so it is always
  * force-disambiguated and reaches the table with exactly one appended
  * suffix"); here the argument is run against seeded adversarial
  * samples: names built from mxid-lookalikes, literal " (mxid)"
  * suffixes, zero-width/LRO/RLO/LTR marks, composed/decomposed NFD
  * pairs, empties, hidden-only names, own-mxid names, non-string
  * (numeric) values, absent keys — in single rooms (bare or forced
  * renders) and in duplicate-name rooms (collision-suffixed renders). */
class StateKeySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-statekey")

  // the test's own oracle over RAW names: the SDK cache-key formula,
  // via the JDK normalizer (the production path uses the native
  // NfdNormalize expression — NormalizeSpec pins the two equal)
  private val Hidden =
    "[\\s\\u00A0\\u1680\\u2000-\\u200F\\u2028\\u2029\\u202A-\\u202F" +
      "\\u205F\\u3000\\uFEFF\\u061C\\u0300-\\u036F]"
  private def strip(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll(Hidden, "")
  private def oracleKey(user: String, dn: Option[Either[String, Long]]): String =
    dn match {
      case Some(Left(s)) if s.nonEmpty && strip(s).nonEmpty && s != user => strip(s)
      case _ => " mxid:" + user // falsy fallback: per-user sentinel
    }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  test("state-key inversion equals the raw-name key on 800 adversarial samples") {
    val rnd = new scala.util.Random(4242)
    val pieces = Vector("Alice", "Bob", "Jos\u00E9", "Jose\u0301", "@a:x",
      " (", ")", "\u200B", "\u202D", "\u202E", "\u200E", "x", ",",
      "\u540D\u524D", " ")
    def mkName(u: String): Option[Either[String, Long]] = rnd.nextInt(20) match {
      case 0 => None                                   // absent → falsy
      case 1 => Some(Right(rnd.nextLong()))            // non-string → falsy
      case 2 => Some(Left(""))                         // empty → falsy
      case 3 => Some(Left(u))                          // own mxid → falsy
      case 4 => Some(Left(s"Alice ($u)"))              // raw name ending in own suffix
      case 5 => Some(Left("\u200B\u200C"))             // hidden-only → falsy
      case _ => Some(Left((0 until 1 + rnd.nextInt(3))
        .map(_ => pieces(rnd.nextInt(pieces.size))).mkString))
    }

    // 400 rooms × 2 users; ~30% of rooms give both users the SAME name
    // so the render goes through the collision-suffix path too
    val samples: Seq[(String, String, Option[Either[String, Long]])] =
      (0 until 400).flatMap { r =>
        val room = s"!k$r:x"
        val (uA, uB) = (s"@k${2 * r}:x", s"@k${2 * r + 1}:x")
        val nA = mkName(uA)
        val nB = if (rnd.nextInt(10) < 3) nA else mkName(uB)
        Seq((room, uA, nA), (room, uB, nB))
      }

    def contentOf(dn: Option[Either[String, Long]]): String = dn match {
      case None => """{"membership":"join"}"""
      case Some(Right(n)) => s"""{"membership":"join","displayname":$n}"""
      case Some(Left(s)) => s"""{"membership":"join","displayname":"${esc(s)}"}"""
    }
    val rows = samples.zipWithIndex.map { case ((room, user, dn), i) =>
      Row(s"$$k$i:x", room, user, "m.room.member", 1000L + i,
        contentOf(dn), null, false, false, null)
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Schemas.rawEvent)

    // render through the REAL projection (backfill scope), persist
    // shape, then invert with the REAL key recovery
    val state: DataFrame = Ingest.projectParticipant(raw)
      .select("user_id", "room_id", "display_name")
    import spark.implicits._
    val probe = samples.map { case (room, _, _) => (room, "@probe:x") }
      .distinct.toDF("room_id", "user_id")
    val recovered = Ingest.stateCollisionKeys(state, probe)
      .select("user_id", "__key").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

    assert(recovered.size == samples.size, "every state row must yield a key")
    val bad = samples.flatMap { case (_, user, dn) =>
      val want = oracleKey(user, dn)
      val got = recovered(user)
      if (got != want) Some(s"$user raw=$dn want=${pp(want)} got=${pp(got)}") else None
    }
    assert(bad.isEmpty, s"${bad.size} inversion mismatches:\n${bad.take(10).mkString("\n")}")
  }

  private def pp(s: String): String = s.map {
    case c if c >= ' ' && c < 127 => c.toString
    case c => f"\\u${c.toInt}%04x"
  }.mkString("\"", "", "\"")
}
