package graft

import graft.ext.TextExpr
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the shared text fragments: docs with
  * fewer than 3 tokens must yield EMPTY shingle sets (matching DuckDB's
  * empty generate_series), never negative-index errors under ANSI mode. */
class TextExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 2, appName = "graft-textexpr")

  test("shingles are empty (not an error) below 3 tokens") {
    import spark.implicits._
    val df = Seq("one", "two words", "now three tokens", "a b c d")
      .toDF("text")
      .withColumn("toks", expr(TextExpr.toksE))
      .withColumn("sh", expr(TextExpr.shinglesE))
      .withColumn("shm", expr(TextExpr.shingleMd5E))
    val rows = df.select(size($"sh"), size($"shm")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((0, 0), (0, 0), (1, 1), (2, 2)))
  }

  test("bpe pieces of a whitespace-only doc yield NULL first_piece") {
    import spark.implicits._
    val out = Seq("   ").toDF("text")
      .withColumn("pieces", expr("regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\\\s]', 0)"))
      .select(expr("try_element_at(pieces, 1)").as("first_piece"))
      .collect()(0)
    assert(out.isNullAt(0))
  }
}
