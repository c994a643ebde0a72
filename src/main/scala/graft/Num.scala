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
  val M: DecimalType = DecimalType(12, 2)
  /** money/quantity column → exact decimal */
  def dec(c: Column): Column = c.cast(M)
  /** exact decimal result → double for a stable output schema */
  def dbl(c: Column): Column = c.cast(DoubleType)
  val one: Column = lit(1.0).cast(M)
}
