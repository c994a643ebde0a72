package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark build function plus (when SQL-expressible)
  * its DuckDB oracle twin. Modules contribute `Map[String, QueryDef]`s
  * that `SparkEntry` flattens into the driver contract.
  *
  * Oracle-parity rules (see SURVEY §7.4 / FIXTURES §C):
  *  - money/`value` doubles are cast to DECIMAL(12,2) *before* arithmetic
  *    so sums are exact and engine-order-independent; final outputs are
  *    cast back to DOUBLE (exact conversion);
  *  - timestamps are emitted as epoch micros/millis BIGINT;
  *  - every computed column is aliased identically on both sides;
  *  - every LIMIT query carries a total order (unique tie-break column).
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
