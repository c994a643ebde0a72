package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-vec")

  test("cosine_sim and dot_product on known vectors") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0, 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0, 0.0),
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f), 11.0 / (math.sqrt(5.0) * math.sqrt(25.0)), 11.0),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f), 0.0, 0.0) // zero-norm guard
    ).toDF("a", "b", "expCos", "expDot")
    val rows = df.select(expr("cosine_sim(a, b)"), expr("dot_product(a, b)"),
      $"expCos", $"expDot").collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-12)
    }
  }

  test("cosine_sim null propagates") {
    VectorFunctions.register(spark)
    val df = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c")
    assert(df.collect()(0).isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    VectorFunctions.register(spark)
    // must be a parquet-backed plan: LocalTableScan of literals skips
    // whole-stage codegen regardless of the expression
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("cosine_sim(embedding, embedding)").as("c"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty,
      s"not codegen'd:\n${df.queryExecution.executedPlan}")
    // self-cosine of any non-zero vector is exactly 1.0
    val total = df.agg(sum("c")).collect()(0).getDouble(0)
    assert(total == df.count().toDouble)
  }

  test("multimodal stub decode is deterministic and batch-shaped") {
    val d1 = ext.Multimodal.decode(spark, "/root/testdata/sf0.001").collect().sortBy(_.doc_id)
    val d2 = ext.Multimodal.decode(spark, "/root/testdata/sf0.001").collect().sortBy(_.doc_id)
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(a => a.width >= 16 && a.height >= 16 && a.channels == 3))
  }
}
