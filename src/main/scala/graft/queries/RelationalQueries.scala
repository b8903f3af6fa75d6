package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Relational coverage over the TPC-H-ish tables: scans with pushed
  * filters, hash/broadcast joins, semi/anti joins, grouped aggregation,
  * deterministic top-k. These exercise the engine surface the feature
  * pipelines sit on (SURVEY.md §2.1–2.3, §2.7).
  *
  * Money sums use the exact-cents pattern (see QueryDef scaladoc):
  * `sum(round(x*100))/100` is order-independent and bit-identical in
  * Spark and DuckDB because every addend is an integer-valued double.
  */
object RelationalQueries {

  private val shipCut = "timestamp_ntz'2000-09-02 00:00:00'"

  val defs: Map[String, QueryDef] = Map(

    // A1-style grouped aggregation over the full fact table (TPC-H Q1
    // shape). At 100 TB this is a pure map-side-combine aggregation into
    // 4 groups — no data-size-proportional shuffle.
    "q1_pricing_summary" -> QueryDef(
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  sum(round(l_extendedprice*100))/100 AS sum_base_price,
         |  sum(round(l_extendedprice*(1-l_discount)*10000))/10000 AS sum_disc_price,
         |  sum(round(l_extendedprice*(1-l_discount)*(1+l_tax)*10000))/10000 AS sum_charge,
         |  sum(l_quantity)/count(*) AS avg_qty,
         |  (sum(round(l_extendedprice*100))/100)/count(*) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= expr(shipCut))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100)) / 100).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)) / 10000)
            .as("sum_disc_price"),
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")) * 10000)) / 10000).as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (sum(round(col("l_extendedprice") * 100)) / 100 / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // Join + grouped agg + deterministic top-k (TPC-H Q3 shape). The
    // revenue is exact, so DESC order + key tiebreak gives a stable
    // LIMIT across engines.
    "q3_topk_revenue" -> QueryDef(
      """SELECT o_orderkey,
        |  sum(round(l_extendedprice*(1-l_discount)*10000))/10000 AS revenue,
        |  count(*) AS n_lines
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)) / 10000)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // 6-way join through the dimension chain (TPC-H Q5 shape). region/
    // nation/supplier are broadcast dims; only orders⋈lineitem shuffles.
    "q5_region_revenue" -> QueryDef(
      """SELECT n_name,
        |  sum(round(l_extendedprice*(1-l_discount)*10000))/10000 AS revenue,
        |  count(*) AS n_lines
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      broadcast(Tables.region(s, dir))
        .join(broadcast(Tables.nation(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.customer(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)) / 10000)
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Fact ⋈ broadcast dimension: the canonical small-dim pattern at
    // scale (no shuffle of the fact side for the join itself).
    "q_broadcast_dim" -> QueryDef(
      """SELECT p_brand,
        |  sum(l_quantity) AS sum_qty,
        |  sum(round(l_extendedprice*100))/100 AS sum_price,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY p_brand""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand")
        .agg(
          sum("l_quantity").as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100)) / 100).as("sum_price"),
          count(lit(1)).as("n_lines"))
    },

    // Multi-predicate scan + global agg (TPC-H Q6 shape): every filter
    // pushed to the parquet scan; no shuffle beyond the 1-row agg.
    "q6_revenue_delta" -> QueryDef(
      """SELECT sum(round(l_extendedprice*l_discount*10000))/10000 AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |  AND l_shipdate < TIMESTAMP '2000-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("timestamp_ntz'1999-01-01 00:00:00'")
          && col("l_shipdate") < expr("timestamp_ntz'2000-01-01 00:00:00'")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(
          (sum(round(col("l_extendedprice") * col("l_discount") * 10000)) / 10000)
            .as("revenue"),
          count(lit(1)).as("n"))
    },

    // Hierarchical aggregation (grouping sets surface; absent in the
    // reference, free in the engine).
    "q_rollup" -> QueryDef(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    },

    // GROUPING SETS with an explicit grouping-id column (CUBE/ROLLUP's
    // general form) — disambiguates "NULL group value" from "rolled-up
    // level" exactly like both engines' GROUPING() function.
    "q_grouping_sets" -> QueryDef(
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg((grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("gid"),
          count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    },

    // PIVOT: per-returnflag order counts spread across linestatus
    // columns — Spark's relational pivot vs the oracle's conditional
    // aggregation (the canonical cross-engine PIVOT encoding). Pivot
    // values are pinned explicitly, so the output schema is static.
    "q_pivot_status" -> QueryDef(
      """SELECT l_returnflag,
        |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F,
        |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        // pivot leaves a missing (flag, status) combo NULL; the
        // conditional-aggregation oracle counts it 0 — align
        .na.fill(0L, Seq("F", "O"))
    },

    // Correlated scalar subquery (TPC-H Q17 shape): revenue from
    // below-fifth-of-average-quantity line items, written as the
    // decorrelated per-part aggregate + join Catalyst would produce.
    // The oracle spells avg as sum/count so both engines compare the
    // identical double (DuckDB's AVG accumulator is not guaranteed to
    // be plain sum/count).
    "q17_small_qty" -> QueryDef(
      """SELECT sum(round(l_extendedprice*100))/100 AS revenue, count(*) AS n
        |FROM lineitem l
        |WHERE l.l_quantity < (
        |  SELECT 0.2 * (sum(l2.l_quantity) / count(*)) FROM lineitem l2
        |  WHERE l2.l_partkey = l.l_partkey)""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val avgQ = li.groupBy(col("l_partkey").as("p_key"))
        .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
      li.join(avgQ, col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(round(col("l_extendedprice") * 100)) / 100).as("revenue"),
          count(lit(1)).as("n"))
    },

    // Left-semi / left-anti joins (EXISTS / NOT EXISTS).
    "q_semi_anti" -> QueryDef(
      """SELECT c_mktsegment, 'with_orders' AS kind, count(*) AS n
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'no_orders' AS kind, count(*) AS n
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("with_orders"))
      val noO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("no_orders"))
      withO.unionByName(noO).select("c_mktsegment", "kind", "n")
    })
}
