package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric determinism helpers (see QueryDef scaladoc).
  *
  * The test tables store money as 2-decimal doubles. Casting to
  * DECIMAL(12,2) *before* arithmetic makes every product/sum exact, so
  * Spark's partial-aggregation order and DuckDB's hash-agg order cannot
  * produce different results. The cast itself is safe because every
  * source value is an exact 2-decimal quantity (verified against the
  * data: discounts/taxes/prices are clean 0.01 multiples), so both
  * engines round the underlying double to the identical decimal.
  */
object Num {
  import org.apache.spark.sql.functions.floor
  import org.apache.spark.sql.types.LongType

  val M: DecimalType = DecimalType(12, 2)
  /** money/quantity column → exact decimal */
  def dec(c: Column): Column = c.cast(M)
  /** exact decimal result → double for a stable output schema */
  def dbl(c: Column): Column = c.cast(DoubleType)
  val one: Column = lit(1.0).cast(M)

  /** Exact integer-cents encoding of a 2-decimal double: round-half-up
    * via floor(x·100 + 0.5) — pure primitive double/long ops that stay
    * in whole-stage codegen, unlike decimal multiplication (Spark's
    * Decimal.* always allocates java BigDecimals, ~10× slower in tight
    * scan-agg loops). Exact because source values are clean 2-decimal
    * quantities, so x·100 is within 1e-9 of an integer. */
  def cents(c: Column): Column = floor(c * 100.0 + 0.5).cast(LongType)

  /** Exact long-units sum → double, dividing by 10^scale through a
    * decimal so the conversion is exact (a plain double division of a
    * >2^53 sum would round twice).
    *
    * Headroom: long partial sums bound the per-query total at ~9e18
    * units; at 100 TB the upgrade path is long partials per partition
    * merged as decimals — same exactness, same codegen hot loop. */
  def unitsToDbl(sumUnits: Column, scale: Int): Column =
    (sumUnits.cast(DecimalType(38, 0)) /
      lit(math.pow(10, scale).toLong)).cast(DoubleType)
}
