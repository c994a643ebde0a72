package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third relational batch — the five TPC-H shapes missing from
  * Tpch/Tpch2, completing the 22-query suite (q1–q22 all registered).
  *
  * The driver star schema has no `partsupp`, `l_shipmode`,
  * `l_commitdate`/`l_receiptdate`, or comment columns, so each query
  * keeps its ORIGINAL optimizer shape with adapted predicates:
  *
  *  - q9: cost basis `0.60 * p_retailprice * l_quantity` stands in for
  *    `ps_supplycost * l_quantity` (no partsupp); 5-way join + profit
  *    aggregate per (nation, year) is unchanged.
  *  - q11: part revenue share stands in for stock value; the signature
  *    group-HAVING-against-global-scalar-subquery shape is unchanged.
  *  - q12: `l_returnflag` stands in for `l_shipmode`; the signature
  *    join + conditional-count pivot on order priority is unchanged.
  *  - q13: an order-priority predicate inside the LEFT JOIN condition
  *    stands in for the comment NOT-LIKE filter; the signature
  *    outer-join-preserving-zero-counts double aggregation is
  *    unchanged.
  *  - q20: 1997 shipped quantity of red parts stands in for available
  *    stock; the signature nested IN-subquery (semi-join) feeding a
  *    supplier/nation join is unchanged. The `> 1.1 × avg` threshold
  *    (non-empty AND selective at every test SF)
  *    is cross-multiplied (`qty·n·10 > total·11`) so the comparison is
  *    exact decimal arithmetic in both engines — no double rounding at
  *    the boundary.
  *
  * Reference basis: SURVEY §2.5 — the reference delegates relational
  * work to PostgreSQL (`src/server/api/routes.ts`); this module
  * finishes the Catalyst-native equivalent surface.
  */
object Tpch3 {
  import Num._

  private def views(s: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      Tables(s, dir, t).createOrReplaceTempView(t)
    }

  val defs: Map[String, QueryDef] = Map(
    // --- Q9: product-type profit. Hot path in integer units (see
    // Num.cents): profit_u6 = rev_u6 - cost_u6, both exact 1e-6 units,
    // one long subtract per row inside codegen; only the final sum is
    // decimal-widened. Dimensions broadcast; the lineitem⋈orders join
    // is the only real shuffle.
    "q9_product_profit" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).filter($"p_name".contains("red"))),
            $"l_partkey" === $"p_partkey")
          .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
          .select($"n_name".as("nation"), year($"o_orderdate").as("o_year"),
            (cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")) * lit(100L) -
              cents($"p_retailprice") * cents($"l_quantity") * lit(60L)).as("profit_u6"))
          .groupBy($"nation", $"o_year")
          .agg(unitsToDbl(sumUnits($"profit_u6"), 6).as("sum_profit"))
      },
      oracle = Some("""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))
                        - 0.60::DECIMAL(3,2) * p_retailprice::DECIMAL(12,2) * l_quantity::DECIMAL(12,2)) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2"""),
      doc = "Q9 profit per (nation, year): 5-way join, retailprice cost basis (no partsupp)"),

    // --- Q11: parts whose revenue share exceeds a global-scalar
    // threshold. Declared as SQL so Catalyst plans the uncorrelated
    // scalar subquery itself (one extra pass over the ALREADY-grouped
    // per-part table, not over lineitem). Threshold compare stays in
    // exact decimal; only the output column is double.
    "q11_important_parts" -> QueryDef(
      build = (s, dir) => {
        views(s, dir)
        s.sql("""
          WITH pv AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS v
            FROM lineitem GROUP BY l_partkey)
          SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
          FROM pv
          WHERE v > (SELECT sum(v) * CAST(0.0006 AS DECIMAL(8,6)) FROM pv)""")
      },
      oracle = Some("""
        WITH pv AS (
          SELECT l_partkey,
                 sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS v
          FROM lineitem GROUP BY l_partkey)
        SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
        FROM pv
        WHERE v > (SELECT sum(v) * 0.0006::DECIMAL(8,6) FROM pv)"""),
      doc = "Q11 important parts: group-HAVING vs uncorrelated global-share scalar subquery"),

    // --- Q12: conditional-count pivot per mode class. One
    // fact-fact join (orders arrives pre-shrunk to two columns), then
    // a 3-group aggregate of two codegen'd conditional counts.
    "q12_shipmode_priority" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .select($"l_orderkey", $"l_returnflag")
          .join(Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_returnflag")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      },
      oracle = Some("""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1"""),
      doc = "Q12 priority pivot per returnflag class (no l_shipmode in schema)"),

    // --- Q13: customer order-count distribution. The predicate lives
    // INSIDE the left-join condition so zero-order customers survive
    // with c_count = 0 — the row the histogram's first bucket counts.
    "q13_customer_distribution" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_orderpriority")
        Tables.customer(s, dir)
          .join(o, $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "5-LOW", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      oracle = Some("""
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey)
        GROUP BY 1"""),
      doc = "Q13 order-count histogram: outer join preserving zero-count customers"),

    // --- Q20: suppliers shipping > 1.5× the average red-part volume.
    // Declared as SQL so Catalyst plans the IN-subquery as a semi-join
    // against the small grouped table and broadcasts it into
    // supplier⋈nation. The threshold is cross-multiplied into exact
    // integer-decimal arithmetic (see scaladoc).
    "q20_promotion_suppliers" -> QueryDef(
      build = (s, dir) => {
        views(s, dir)
        s.sql("""
          WITH sq AS (
            SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%red%'
              AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE s_suppkey IN (
            SELECT l_suppkey FROM sq
            WHERE qty * (SELECT count(*) FROM sq) * 10 > (SELECT sum(qty) * 11 FROM sq))""")
      },
      oracle = Some("""
        WITH sq AS (
          SELECT l_suppkey, sum(l_quantity::DECIMAL(12,2)) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%red%'
            AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM sq
          WHERE qty * (SELECT count(*) FROM sq) * 10 > (SELECT sum(qty) * 11 FROM sq))"""),
      doc = "Q20 promotion suppliers: nested IN-subquery semi-join, exact cross-multiplied threshold")
  )
}
