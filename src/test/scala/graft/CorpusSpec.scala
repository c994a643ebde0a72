package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape contracts for the corpus-organization
  * operators (ext/Corpus) that the value-level oracle can't see. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-corpus")
  val sf = "/root/testdata/sf0.01"

  test("txt_hash_split partitions the corpus: counts sum to total, ratios near 80/10/10") {
    val total = Tables.documents(spark, sf).count()
    val rows = SparkEntry.queries("txt_hash_split")(spark, sf)
      .select("split", "n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "validation", "test"))
    assert(rows.values.sum == total, "every doc lands in exactly one split")
    // md5 buckets are uniform; at n=500 the 80% slice stays within a
    // generous ±10pt band — a skewed hash or an off-by-one in the
    // bucket carve would land far outside it
    val trainFrac = rows("train").toDouble / total
    assert(trainFrac > 0.70 && trainFrac < 0.90, s"train fraction $trainFrac")
  }

  test("txt_hash_split is stable under corpus growth: a doc never migrates splits") {
    // assignment depends only on the doc's own id — recompute on a
    // half corpus and check every common doc kept its split
    import spark.implicits._
    def assignments(df: org.apache.spark.sql.DataFrame): Map[Long, String] = df
      .withColumn("bucket", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS INT) % 100"))
      .withColumn("split", when($"bucket" < 80, "train")
        .when($"bucket" < 90, "validation").otherwise("test"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = assignments(Tables.documents(spark, sf))
    val half = assignments(Tables.documents(spark, sf).filter($"doc_id" % 2 === 0))
    half.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id migrated from ${full(id)} to $s")
    }
  }

  test("txt_pack_chunks conserves tokens and packs in doc_id order") {
    import graft.ext.TextExpr.toksE
    val totalTokens = Tables.documents(spark, sf)
      .withColumn("toks", expr(toksE))
      .agg(sum(size(col("toks")).cast("long"))).head().getLong(0)
    val chunks = SparkEntry.queries("txt_pack_chunks")(spark, sf)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(chunks.map(_._3).sum == totalTokens,
      "every token is packed exactly once")
    // concat-then-chunk over doc_id order ⇒ chunk doc-ranges are
    // disjoint and monotone: chunk k's last doc precedes chunk k+1's
    // first doc
    chunks.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
        assert(lastA < firstB, "chunks must cover disjoint, ordered doc ranges")
      case _ => ()
    }
  }

  test("txt_pack_chunks plans the prefix sum distributed: no single-partition exchange") {
    // the naive global-cumsum window would plan Exchange SinglePartition
    // (one task holds the corpus) — the two-phase formulation must not
    val plan = SparkEntry.queries("txt_pack_chunks")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"packing must not serialize onto one task:\n$plan")
  }
}
