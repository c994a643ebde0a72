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

  /** Sum of long unit values — the single choke point for every
    * units-based aggregate. Runs as a primitive long sum (codegen fast
    * path; a DECIMAL(38,0) buffer was measured ~6× slower at 6M rows).
    * Overflow CANNOT be silently wrong: Spark 4 runs ANSI mode by
    * default (pinned by QueriesSpec), so a sum past ±9.2e18 units
    * throws ARITHMETIC_OVERFLOW. A deployment that legitimately needs
    * more headroom flips this one function to
    * `sum(units.cast(DecimalType(38, 0)))` — same exact results. */
  def sumUnits(units: Column): Column =
    org.apache.spark.sql.functions.sum(units)

  /** Exact decimal-units sum → double, dividing by 10^scale through
    * decimal arithmetic so the conversion is exact (a plain double
    * division of a >2^53 sum would round twice). Scale ≤ 6 only: Spark
    * caps the division result scale at 6, so a larger request would
    * silently round. */
  def unitsToDbl(sumUnits: Column, scale: Int): Column = {
    require(scale <= 6, s"unitsToDbl exactness holds only for scale <= 6, got $scale")
    (sumUnits.cast(DecimalType(38, 0)) /
      lit(math.pow(10, scale).toLong)).cast(DoubleType)
  }
}
