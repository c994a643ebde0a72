package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The numeric determinism layer is the most load-bearing invariant in
  * the engine (every oracle match depends on it) — pin its edge cases.
  */
class NumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(cores = 4, appName = "graft-num")

  test("cents() is exact for every 2-decimal value (round-half-up)") {
    import spark.implicits._
    // every 2-decimal value in [0, 100): the double is never exactly on
    // a rounding boundary, so floor(x*100+0.5) must recover the integer
    val vals = (0 until 10000).map(i => i / 100.0)
    val got = vals.toDF("x").select(Num.cents($"x").as("c"))
      .as[Long].collect()
    assert(got.toSeq == (0L until 10000L))
  }

  test("cents() + unitsToDbl roundtrip equals the decimal pipeline") {
    import spark.implicits._
    val vals = Seq(0.01, 0.10, 99.99, 185.22, 1234567.89)
    val df = vals.toDF("x")
    val viaCents = df.select(Num.unitsToDbl(Num.sumUnits(Num.cents($"x")), 2))
      .collect()(0).getDouble(0)
    val viaDec = df.select(Num.dbl(sum(Num.dec($"x")))).collect()(0).getDouble(0)
    assert(viaCents == viaDec, s"$viaCents != $viaDec")
  }

  test("unitsToDbl rejects scales beyond exactness guarantee") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Seq(1L).toDF("x").select(Num.unitsToDbl(sum($"x"), 7))
    }
  }

  test("decimal product pipeline is exact: sum of 0.01-grid products") {
    import spark.implicits._
    // (price, discount) grid: sum(price*(1-d)) must be an exact
    // 4-decimal quantity with zero float drift
    val rows = for (p <- 1 to 50; d <- 0 to 10) yield (p + 0.99, d / 100.0)
    val total = rows.toDF("p", "d")
      .select(Num.dbl(sum(Num.dec($"p") * (Num.one - Num.dec($"d")))).as("s"))
      .collect()(0).getDouble(0)
    val expected = rows.map { case (p, d) =>
      (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1) - BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    }.sum.toDouble
    assert(total == expected)
  }
}
