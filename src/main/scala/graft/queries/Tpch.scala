package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join/aggregation suite over the TPC-H-ish star schema.
  *
  * These are the scale-bearing queries: multi-way joins with broadcast
  * dimensions, partial-aggregate-friendly groupings, top-k via
  * `TakeOrderedAndProject` (orderBy+limit — no full sort at scale), a
  * semi-join (EXISTS), a window ranking, and a set operation. Catalyst
  * handles pushdown/pruning; we only hint `broadcast()` on genuinely
  * small dimensions (region/nation/customer at any SF ≪ fact tables).
  *
  * Reference basis: SURVEY §2.4-§2.5 — the reference delegates all
  * relational work to PostgreSQL (`src/server/api/routes.ts`); this
  * module is the Catalyst-native equivalent of that query surface
  * widened to the driver's star schema.
  */
object Tpch {
  import Num._

  val defs: Map[String, QueryDef] = Map(
    // --- Q1-style pricing summary: the canonical partial-agg scan.
    // Hot path: exact integer-cents arithmetic (see Num.cents) — the
    // per-row multiply chain stays primitive long inside codegen
    // (decimal multiplies allocate BigDecimals, ~10× slower in this
    // loop); only the aggregation buffer is decimal (sumUnits), which
    // cannot silently wrap at scale.
    "q1_pricing_summary" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" <= lit("2001-09-01").cast("timestamp"))
          .select($"l_returnflag", $"l_linestatus",
            cents($"l_quantity").as("qty_c"),
            cents($"l_extendedprice").as("price_c"),
            cents($"l_discount").as("disc_c"),
            cents($"l_tax").as("tax_c"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            unitsToDbl(sumUnits($"qty_c"), 2).as("sum_qty"),
            unitsToDbl(sumUnits($"price_c"), 2).as("sum_base_price"),
            unitsToDbl(sumUnits($"price_c" * (lit(100L) - $"disc_c")), 4).as("sum_disc_price"),
            unitsToDbl(sumUnits($"price_c" * (lit(100L) - $"disc_c") * (lit(100L) + $"tax_c")), 6).as("sum_charge"),
            round(unitsToDbl(sumUnits($"qty_c"), 2) / count(lit(1)), 4).as("avg_qty"),
            round(unitsToDbl(sumUnits($"price_c"), 2) / count(lit(1)), 4).as("avg_price"),
            round(unitsToDbl(sumUnits($"disc_c"), 2) / count(lit(1)), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(l_quantity::DECIMAL(12,2)) AS DOUBLE) AS sum_qty,
          CAST(sum(l_extendedprice::DECIMAL(12,2)) AS DOUBLE) AS sum_base_price,
          CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2)) * (1.00::DECIMAL(12,2) + l_tax::DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
          round(CAST(sum(l_quantity::DECIMAL(12,2)) AS DOUBLE) / count(*), 4) AS avg_qty,
          round(CAST(sum(l_extendedprice::DECIMAL(12,2)) AS DOUBLE) / count(*), 4) AS avg_price,
          round(CAST(sum(l_discount::DECIMAL(12,2)) AS DOUBLE) / count(*), 4) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus"""),
      doc = "TPC-H Q1 analog: wide partial aggregation over the fact table"),

    // --- Q3-style shipping priority: fact ⋈ fact ⋈ broadcast dim, top-k.
    "q3_shipping_priority" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val cut = lit("1998-06-30").cast("timestamp")
        val c = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
        val o = Tables.orders(s, dir).filter($"o_orderdate" < cut)
        val l = Tables.lineitem(s, dir).filter($"l_shipdate" > cut)
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(sumUnits(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).as("rev_units"))
          .select($"l_orderkey", unitsToDbl($"rev_units", 4).as("revenue"),
            unix_millis($"o_orderdate").as("o_orderdate_ms"))
          .orderBy($"revenue".desc, $"l_orderkey".asc)
          .limit(10)
      },
      oracle = Some("""
        SELECT l_orderkey,
          CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE) AS revenue,
          epoch_ms(o_orderdate) AS o_orderdate_ms
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-30'
          AND l_shipdate  > TIMESTAMP '1998-06-30'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10"""),
      doc = "TPC-H Q3 analog: 3-way join, broadcast dim, TakeOrderedAndProject top-k"),

    // --- Q4-style order priority: EXISTS → left-semi join.
    "q4_order_priority" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1996-07-01").cast("timestamp"))
        val l = Tables.lineitem(s, dir)
        o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      oracle = Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority"""),
      doc = "TPC-H Q4 analog: EXISTS subquery = left-semi join"),

    // --- Q5-style local supplier volume: 6-way join, broadcast dims.
    "q5_local_supplier" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val r = Tables.region(s, dir).filter($"r_name" === "ASIA")
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val sup = Tables.supplier(s, dir)
        val o = Tables.orders(s, dir)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, dir)
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(c),
            $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(unitsToDbl(sumUnits(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))), 4).as("revenue"))
      },
      oracle = Some("""
        SELECT n_name,
          CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey  = s_suppkey
        JOIN customer ON o_custkey  = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name"""),
      doc = "TPC-H Q5 analog: multi-way join with broadcast dimensions"),

    // --- Q6-style revenue forecast: pure pushed-down scan-filter-agg.
    "q6_revenue_forecast" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
            $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
          .agg(unitsToDbl(sumUnits(cents($"l_extendedprice") * cents($"l_discount")), 4).as("revenue"))
      },
      oracle = Some("""
        SELECT CAST(sum(l_extendedprice::DECIMAL(12,2) * l_discount::DECIMAL(12,2)) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24"""),
      doc = "TPC-H Q6 analog: filter fully pushed to the parquet scan"),

    // --- Q10-style returned items: customer revenue ranking.
    "q10_returned_items" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
          .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        val l = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
          .agg(sumUnits(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))).as("rev_units"))
          .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name", unitsToDbl($"rev_units", 4).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey".asc)
          .limit(20)
      },
      oracle = Some("""
        SELECT c_custkey, c_name, c_acctbal, n_name,
          CAST(sum(l_extendedprice::DECIMAL(12,2) * (1.00::DECIMAL(12,2) - l_discount::DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20"""),
      doc = "TPC-H Q10 analog: revenue ranking with broadcast dims"),

    // --- Q18-style large-volume orders: agg → join → top-k.
    "q18_large_volume" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val bigOrders = Tables.lineitem(s, dir)
          .groupBy($"l_orderkey")
          .agg(sumUnits(cents($"l_quantity")).as("qty_c"))
          .filter($"qty_c" > 15000) // 150 in cents units
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        bigOrders.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey", $"o_orderkey",
            unix_millis($"o_orderdate").as("o_orderdate_ms"),
            $"o_totalprice", unitsToDbl($"qty_c", 2).as("total_qty"))
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(20)
      },
      oracle = Some("""
        SELECT c_name, c_custkey, o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
               o_totalprice, CAST(qty AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey, sum(l_quantity::DECIMAL(12,2)) AS qty
              FROM lineitem GROUP BY l_orderkey HAVING qty > 150) big
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20"""),
      doc = "TPC-H Q18 analog: pre-aggregation before join (map-side-combine friendly)"),

    // --- window ranking: top-3 parts per brand by retail price.
    "qw_brand_top3" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"p_brand")
          .orderBy($"p_retailprice".desc, $"p_partkey".asc)
        Tables.part(s, dir)
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"p_brand", $"p_partkey", $"p_retailprice", $"rk")
      },
      oracle = Some("""
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
        FROM part
        QUALIFY rk <= 3"""),
      doc = "window ranking: row_number over partitioned ordering"),

    // --- set op: nations with customers but no suppliers (EXCEPT).
    "qs_customer_only_nations" -> QueryDef(
      build = (s, dir) => {
        import s.implicits._
        val n = Tables.nation(s, dir)
        val custNations = Tables.customer(s, dir)
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .select($"n_name").distinct()
        val supNations = Tables.supplier(s, dir)
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .select($"n_name").distinct()
        custNations.except(supNations)
      },
      oracle = Some("""
        SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        EXCEPT
        SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey"""),
      doc = "set operation: EXCEPT over two distinct projections")
  )
}
