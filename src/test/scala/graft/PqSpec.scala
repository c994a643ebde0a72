package graft

import graft.ext.{Embeddings, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the PQ family the DuckDB gate can't express: the
  * hand-checked per-subspace argmin on planted codebooks (including
  * the cross-product property that IS product quantization — a vector
  * can combine any subspace's codes independently), and the audit
  * floor at the spec SF.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(cores = 4, appName = "graft-test")
  val sf = "/root/testdata/sf0.001"

  /** Planted 8-dim corpus, m=2 subspaces × w=4: label-0 vectors live at
    * (0⁴, 10⁴), label-1 at (8⁴, 0⁴) — so the trained codebook entries
    * are exactly those two points per subspace. */
  private def planted(rows: Seq[(Long, Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
  }

  private val train = Seq(
    (0L, 0, Seq(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0)),
    (1L, 0, Seq(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 10.0)),
    (2L, 1, Seq(8.0, 8.0, 8.0, 8.0, 0.0, 0.0, 0.0, 0.0)),
    (3L, 1, Seq(8.0, 8.0, 8.0, 8.0, 0.0, 0.0, 0.0, 0.0)))

  test("codes: per-subspace argmin against planted codebooks, hand-checked") {
    val cents = Embeddings.centroids(planted(train))
    // v4 mixes the two clusters: sub0 nearest label-1 entry, sub1
    // nearest label-0 entry — the cross-product combination neither
    // training vector exhibits (the product-quantization property)
    val vecs = planted(train :+ (4L, 0, Seq(8.0, 8.0, 8.0, 8.0, 10.0, 10.0, 10.0, 10.0)))
    val got = Pq.codes(vecs, cents, m = 2, w = 4)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getDouble(3)))).toMap
    assert(got((0L, 0)) == ((0, 0.0)) && got((0L, 1)) == ((0, 0.0)))
    assert(got((2L, 0)) == ((1, 0.0)) && got((2L, 1)) == ((1, 0.0)))
    assert(got((4L, 0)) == ((1, 0.0)), "v4 subspace 0 must pick the label-1 entry")
    assert(got((4L, 1)) == ((0, 0.0)), "v4 subspace 1 must pick the label-0 entry")
    // and the rejected entries are genuinely farther: d2 to the other
    // codebook entry is 4·8² = 256 / 4·10² = 400, never chosen
    assert(got.values.forall(_._2 == 0.0), "planted vectors quantize exactly")
  }

  test("every corpus vector encodes to exactly m codes within [0, k)") {
    val e = Tables.embeddings(spark, sf)
    val k = e.select("label").distinct().count().toInt
    val df = SparkEntry.queries("sim_pq_encode")(spark, sf).collect()
    assert(df.length == e.count())
    df.foreach { r =>
      Seq("code_0", "code_1", "code_2", "code_3").foreach { c =>
        val v = r.getInt(r.fieldIndex(c))
        assert(v >= 0 && v < k, s"vec ${r.getLong(0)}: $c=$v outside [0, $k)")
      }
      assert(r.getDouble(r.fieldIndex("recon_d2")) >= 0.0)
    }
  }

  test("ADC on an exactly-quantizable corpus equals the exact subspace distances") {
    // candidates AT codebook points ⇒ ADC(q, n) is exactly d2(q, n's
    // reconstruction) = d2(q, n) — approximate search becomes exact
    val cents = Embeddings.centroids(planted(train))
    val q = planted(Seq((9L, 0, Seq(1.0, 1.0, 1.0, 1.0, 9.0, 9.0, 9.0, 9.0))))
    val lut = Pq.subD2(q, cents, m = 2, w = 4) // (vec_id, sub, c_label, d2)
      .collect().map(r => ((r.getInt(1), r.getInt(2)), r.getDouble(3))).toMap
    // q → label0 entry: sub0 d2 = 4·1² = 4, sub1 d2 = 4·1² = 4
    // q → label1 entry: sub0 d2 = 4·7² = 196, sub1 d2 = 4·9² = 324
    assert(lut((0, 0)) == 4.0 && lut((1, 0)) == 4.0)
    assert(lut((0, 1)) == 196.0 && lut((1, 1)) == 324.0)
    // ADC to v0 (codes 0,0) = 8; to v2 (codes 1,1) = 520; to v4-style
    // mixed codes (1,0) = 196 + 4 = 200 — table lookups compose
    assert(lut((0, 0)) + lut((1, 0)) == 8.0)
    assert(lut((0, 1)) + lut((1, 1)) == 520.0)
  }

  test("adc_topk emits exactly 5 ranked neighbors per query; audits behave") {
    val topk = SparkEntry.queries("sim_pq_adc_topk")(spark, sf).collect()
    val perQ = topk.groupBy(_.getLong(0))
    assert(perQ.size == 10)
    perQ.foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q: ${rows.length} rows")
      assert(rows.map(_.getInt(rows.head.fieldIndex("rank"))).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      rows.foreach(r => assert(r.getDouble(r.fieldIndex("adc")) >= 0.0))
    }
    // honest audit: recall in [0,1] over exactly the 10 queries (the
    // VALUE is gated by the DuckDB twin, not a floor — see Pq scaladoc)
    val audit = SparkEntry.queries("sim_pq_recall_audit")(spark, sf).collect()
    assert(audit.length == 10)
    audit.foreach { r =>
      val rec = r.getDouble(r.fieldIndex("recall"))
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // control: on the planted zero-noise corpus ADC IS exact search,
    // so recall@5 must be exactly 1.0 for every query
    val ctl = SparkEntry.queries("sim_pq_recall_structured")(spark, sf).collect()
    assert(ctl.length == 10)
    ctl.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("recall_ok")) &&
        r.getDouble(r.fieldIndex("recall")) == 1.0,
        s"query ${r.getLong(0)}: structured recall ${r.getDouble(r.fieldIndex("recall"))} != 1.0")
    }
  }

  test("ivfpq composition: 3 ranked hits per query, all from the query's probed cells") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("sim_ivfpq_topk")(spark, sf).collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size == 10)
    perQ.foreach { case (q, rs) =>
      assert(rs.length == 3, s"query $q: ${rs.length} rows")
      assert(rs.map(_.getInt(rs.head.fieldIndex("rank"))).sorted.toSeq == Seq(1, 2, 3))
    }
    // candidate restriction law: every returned neighbor must share a
    // cell with one of its query's nprobe=2 probed cells
    val e = Tables.embeddings(spark, sf)
    val cents = Embeddings.centroids(e)
    val cells = Embeddings.assignTop(e, cents, 1)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val probed = Embeddings.assignTop(e.filter(col("vec_id") < 10), cents, 2)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).toSet).toMap
    rows.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(probed(q).contains(cells(n)),
        s"neighbor $n of query $q sits outside the probed cells ${probed(q)}")
    }
  }

  test("persisted IVF-PQ read equals the in-plan composition row for row") {
    // same-oracle discipline made local: the committed-codes read path
    // and the re-encoding baseline must agree exactly (both also gate
    // against the shared DuckDB twin per round)
    def sorted(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long], r(3).asInstanceOf[Int])).toSeq
    assert(sorted("sim_ivfpq_persisted_topk") == sorted("sim_ivfpq_topk"))
  }

  test("persisted PQ codes: bucket-pruned read of a probed cell equals the filtered snapshot, reading fewer rows") {
    // the deployment claim behind the cell_key bucketing of the codes
    // table (the EmbeddingsSpec assignment-table proof, applied to the
    // PQ half): a probe opens only its nprobe cells' buckets
    import graft.etl.MergeWriter
    import spark.implicits._
    val (_, pqdir) = Pq.materializePqIndex(spark, sf)
    val full = MergeWriter.readSnapshot(spark, pqdir, Pq.pqIdxSchema)
    val key = "c3"
    val expect = full.filter($"cell_key" === key)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(expect.nonEmpty, "cell c3 must be populated at sf0.001")
    val bid = MergeWriter.bucketIdOf(key, Embeddings.IdxAsgBuckets)
    val prunedScan = MergeWriter.readBuckets(spark, pqdir, Pq.pqIdxSchema, Set(bid))
    val got = prunedScan.filter($"cell_key" === key)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(got == expect, "bucket-pruned codes read lost or invented rows")
    assert(prunedScan.count() < full.count(),
      "one-bucket codes read opened the whole table — pruning is not happening")
  }

  test("encode is deterministic across runs") {
    def run() = SparkEntry.queries("sim_pq_encode")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
