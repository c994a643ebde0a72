package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second relational batch: the Catalyst-optimizer showcases —
  * correlated/uncorrelated scalar subqueries (decorrelated to joins by
  * Catalyst, exactly as Postgres does for the reference's Q2/Q5 —
  * SURVEY §4), anti-joins (NOT EXISTS), disjunctive pushdown, ratio
  * aggregates, rollup. Some queries are written as `spark.sql` text on
  * purpose: declaring the subquery and letting Catalyst decorrelate IS
  * the Spark-first design (hand-rewriting it would just duplicate the
  * optimizer).
  */
object Tpch2 {
  import Num._

  private def views(s: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      Tables(s, dir, t).createOrReplaceTempView(t)
    }

  val defs: Map[String, QueryDef] = Map(
    // correlated scalar subquery → decorrelated min-join (TPC-H Q2 shape)
    "q2_correlated_min" -> QueryDef(
      build = (s, dir) => {
        views(s, dir)
        s.sql("""
          SELECT c_custkey, c_name, c_nationkey, c_acctbal
          FROM customer c
          WHERE c_acctbal = (SELECT min(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)""")
      },
      oracle = Some("""
        SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (SELECT min(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)"""),
      doc = "correlated scalar subquery; Catalyst decorrelates to agg+join"),

    // nation-pair trade volume by year (TPC-H Q7 shape)
    "q7_volume_shipping" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val n1 = Tables.nation(s, dir).select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
        val n2 = Tables.nation(s, dir).select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
          .join(broadcast(n1), $"s_nationkey" === $"s_nk")
          .join(broadcast(n2), $"c_nationkey" === $"c_nk")
          .filter($"supp_nation" =!= $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
          .agg(unitsToDbl(sumUnits(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))), 4).as("revenue"))
      },
      oracle = Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3"""),
      doc = "nation-pair trade volume: 6-way join + year bucketing"),

    // market-share ratio aggregate (TPC-H Q8 shape)
    "q8_market_share" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val n = Tables.nation(s, dir)
        val joined = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .withColumn("volume", cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
        joined.groupBy(year($"o_orderdate").as("o_year"))
          .agg(
            round(unitsToDbl(sumUnits(when($"n_name" === "CHINA", $"volume").otherwise(lit(0L))), 4) /
              unitsToDbl(sumUnits($"volume"), 4), 6).as("mkt_share"))
      },
      oracle = Some("""
        SELECT year(o_orderdate) AS o_year,
               round(CAST(sum(CASE WHEN n_name = 'CHINA'
                                   THEN l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))
                                   ELSE 0 END) AS DOUBLE)
                     / CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE), 6) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY 1"""),
      doc = "market-share: conditional-aggregate ratio per year"),

    // promo revenue ratio (TPC-H Q14 shape)
    "q14_promo_effect" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-02-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
          .withColumn("volume", cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
          .agg(round(lit(100.0) *
            unitsToDbl(sumUnits(when($"p_type" === "PROMO", $"volume")), 4)
              / unitsToDbl(sumUnits($"volume"), 4), 6)
            .as("promo_revenue_pct"))
      },
      oracle = Some("""
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2)) END) AS DOUBLE)
                   / CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-02-01'"""),
      doc = "promo-effect ratio with broadcast part dimension"),

    // uncorrelated scalar subquery: suppliers hitting max revenue (Q15)
    "q15_top_supplier" -> QueryDef(
      build = (s, dir) => {
        views(s, dir)
        s.sql("""
          WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.0 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, total_revenue
          FROM supplier JOIN revenue ON s_suppkey = supplier_no
          WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""")
      },
      oracle = Some("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"""),
      doc = "uncorrelated scalar subquery over a CTE (view-style Q15)"),

    // distinct counting (TPC-H Q16 shape)
    "q16_distinct_suppliers" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        // pre-shrink: countDistinct(l_suppkey) only needs the DISTINCT
        // (partkey, suppkey) pairs — collapsing lineitem first cuts the
        // Expand input from |lineitem| to |pairs| before the join and
        // the double shuffle that countDistinct plans
        Tables.lineitem(s, dir)
          .select($"l_partkey", $"l_suppkey").distinct()
          .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand", $"p_type")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      },
      oracle = Some("""
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2"""),
      doc = "distinct aggregation: suppliers per (brand, type)"),

    // correlated avg subquery (TPC-H Q17 shape)
    "q17_small_quantity" -> QueryDef(
      build = (s, dir) => {
        views(s, dir)
        s.sql("""
          SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_brand = 'Brand#1'
            AND l_quantity < (SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*))
                              FROM lineitem l2 WHERE l2.l_partkey = l_partkey)""")
      },
      oracle = Some("""
        SELECT round(CAST(sum(l_extendedprice::DECIMAL(12,2)) AS DOUBLE) / 7.0, 4) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * (CAST(sum(l2.l_quantity::DECIMAL(12,2)) AS DOUBLE) / count(*))
                            FROM lineitem l2 WHERE l2.l_partkey = l_partkey)"""),
      doc = "correlated aggregate subquery; decorrelated to a per-key avg join"),

    // disjunctive predicate pushdown (TPC-H Q19 shape)
    "q19_disjunctive" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
          .filter(
            ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
            ($"p_brand" === "Brand#2" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
            ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30)))
          .agg(unitsToDbl(sumUnits(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))), 4).as("revenue"))
      },
      oracle = Some("""
        SELECT CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"""),
      doc = "disjunctive multi-bracket predicate (pushdown stress)"),

    // NOT EXISTS anti-join (TPC-H Q21/Q22 flavor)
    "q21_anti_join" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val withF = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
          .select($"o_custkey").distinct()
        Tables.customer(s, dir)
          .join(withF, $"c_custkey" === withF("o_custkey"), "left_anti")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("numcust"), dbl(sum(dec($"c_acctbal"))).as("totacctbal"))
      },
      oracle = Some("""
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(c_acctbal::DECIMAL(12,2)) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        GROUP BY c_nationkey"""),
      doc = "NOT EXISTS = left-anti join, grouped account balances"),

    // uncorrelated avg filter + anti-join (TPC-H Q22 shape)
    "q22_above_avg_inactive" -> QueryDef(
      build = (s, dir) => {
        views(s, dir)
        s.sql("""
          SELECT c_nationkey, count(*) AS numcust,
                 CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
          FROM customer
          WHERE c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                             FROM customer c2 WHERE c2.c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY c_nationkey""")
      },
      oracle = Some("""
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(c_acctbal::DECIMAL(12,2)) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(sum(c2.c_acctbal::DECIMAL(12,2)) AS DOUBLE) / count(*)
                           FROM customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey"""),
      doc = "global-avg scalar subquery + NOT EXISTS anti-join"),

    // rollup: multi-level aggregation in one pass
    "qr_rollup_sales" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), dbl(sum(dec($"l_quantity"))).as("sum_qty"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(l_quantity::DECIMAL(12,2)) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)"""),
      doc = "ROLLUP hierarchy aggregation (per-flag, per-status, grand total)")
  )
}
