package graft.queries

import graft.GraftQuery
import graft.functions.Stable.{dsum, dsumSql}
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish tables — the category
  * checklist of SURVEY.md §2.6 (joins, aggregation, window, sort/top-k, set
  * ops, distinct, string/date/conditional expressions), each with a DuckDB
  * oracle twin.
  *
  * Scale notes: filters/projections ride parquet pushdown; the dimension
  * side of every join is explicitly `broadcast()` (region/nation/part/
  * supplier stay small at any SF; customer/orders/lineitem shuffle on their
  * join keys and AQE handles skew); aggregates are plain hash aggregates
  * with automatic partials; top-k plans as TakeOrderedAndProject, never a
  * global sort.
  */
object RelationalQueries {

  def all: Seq[GraftQuery] = Seq(

    // TPC-H Q1-style pricing summary: multi-expression hash aggregate.
    GraftQuery("q1_agg",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          (dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        s"""SELECT l_returnflag, l_linestatus,
           |  ${dsumSql("l_quantity")} AS sum_qty,
           |  ${dsumSql("l_extendedprice")} AS sum_base_price,
           |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
           |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
           |  ${dsumSql("l_quantity")} / count(*) AS avg_qty,
           |  ${dsumSql("l_extendedprice")} / count(*) AS avg_price,
           |  count(*) AS count_order
           |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Selective filter + narrow projection — parquet pushdown + pruning.
    GraftQuery("q_filter_project",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
          col("l_returnflag") === "R" && col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
      Some(
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          |  AND l_returnflag = 'R' AND l_quantity > 30
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Fact ⋈ broadcast(dim) + aggregate.
    GraftQuery("q_join_broadcast",
      (s, d) => lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum(col("l_extendedprice"), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand"),
      Some(
        s"""SELECT p_brand, ${dsumSql("l_extendedprice")} AS revenue, count(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // 5-way join down the star: region→nation→customer→orders→lineitem.
    GraftQuery("q_join_multi",
      (s, d) => lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name"),
      Some(
        s"""SELECT r_name, n_name,
           |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
           |  count(*) AS n_lines
           |FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // Global top-k — plans as TakeOrderedAndProject (per-partition heaps).
    GraftQuery("q_topk_orders",
      (s, d) => orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(15),
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin)),

    // distinct + count-distinct.
    GraftQuery("q_distinct_agg",
      (s, d) => customer(s, d)
        .groupBy("c_mktsegment")
        .agg(countDistinct("c_nationkey").as("n_nations"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment"),
      Some(
        """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n_cust
          |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Ranking window: top-3 orders per customer.
    GraftQuery("q_window_rank",
      (s, d) => orders(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn"),
      Some(
        """WITH r AS (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders)
          |SELECT o_custkey, o_orderkey, o_totalprice, rn FROM r
          |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Running-total window (frame-based aggregation; deterministic order
    // via unique (shipdate, orderkey, linenumber) key → exact decimal sum).
    GraftQuery("q_window_running",
      (s, d) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lineitem(s, d)
          .filter(col("l_suppkey") <= 10)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").as("running_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some(
        """SELECT l_suppkey, l_orderkey, l_linenumber,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
          |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
          |FROM lineitem WHERE l_suppkey <= 10
          |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // Left-semi join (EXISTS).
    GraftQuery("q_semi_join",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_with_orders"))
        .orderBy("c_nationkey"),
      Some(
        """SELECT c_nationkey, count(*) AS n_with_orders FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Full outer join — the one join shape the suite lacked: BUILDING
    // customers vs high-volume order books (n ≥ 10), preserving
    // unmatched rows on BOTH sides (at sf0.01: 148 left-only, 654
    // right-only, 154 matched — all three cases exercised). The count
    // threshold keeps the filter integer-exact; the sort key is the
    // coalesced join key, never null.
    GraftQuery("q_full_outer_join",
      (s, d) => {
        val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_acctbal"))
        val agg = orders(s, d).groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders")).filter(col("n_orders") >= 10)
        cust.join(agg, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_acctbal"), col("n_orders"))
          .orderBy("custkey")
      },
      Some(
        """WITH c AS (SELECT c_custkey, c_acctbal FROM customer
          |           WHERE c_mktsegment = 'BUILDING'),
          |a AS (SELECT o_custkey, count(*) AS n_orders FROM orders
          |      GROUP BY o_custkey HAVING count(*) >= 10)
          |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, n_orders
          |FROM c FULL OUTER JOIN a ON c_custkey = o_custkey
          |ORDER BY custkey""".stripMargin)),

    // Left-anti join (NOT EXISTS): orders with no returned ('R') line.
    GraftQuery("q_anti_join",
      (s, d) => orders(s, d)
        .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_unreturned"))
        .orderBy("o_orderstatus"),
      Some(
        """SELECT o_orderstatus, count(*) AS n_unreturned FROM orders
          |WHERE NOT EXISTS (SELECT 1 FROM lineitem
          |                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Set operations: UNION ALL / EXCEPT / INTERSECT.
    GraftQuery("q_union_all",
      (s, d) => nation(s, d).select(col("n_name").as("name"), lit("nation").as("kind"))
        .unionAll(region(s, d).select(col("r_name").as("name"), lit("region").as("kind")))
        .orderBy("kind", "name"),
      Some(
        """SELECT name, kind FROM (
          |  SELECT n_name AS name, 'nation' AS kind FROM nation
          |  UNION ALL
          |  SELECT r_name AS name, 'region' AS kind FROM region)
          |ORDER BY kind, name""".stripMargin)),

    // Customers who order, but never above 200k.
    GraftQuery("q_except",
      (s, d) => orders(s, d).select("o_custkey").distinct()
        .except(orders(s, d).filter(col("o_totalprice") > 200000.0)
          .select("o_custkey").distinct())
        .orderBy("o_custkey"),
      Some(
        """SELECT o_custkey FROM (
          |  SELECT DISTINCT o_custkey FROM orders
          |  EXCEPT
          |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000.0)
          |ORDER BY o_custkey""".stripMargin)),

    GraftQuery("q_intersect",
      (s, d) => customer(s, d).select(col("c_nationkey").as("nkey"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("nkey")))
        .orderBy("nkey"),
      Some(
        """SELECT nkey FROM (
          |  SELECT c_nationkey AS nkey FROM customer
          |  INTERSECT
          |  SELECT s_nationkey AS nkey FROM supplier)
          |ORDER BY nkey""".stripMargin)),

    // String function battery.
    GraftQuery("q_string_funcs",
      (s, d) => part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some(
        """SELECT p_partkey, upper(p_name) AS name_u, length(p_name) AS name_len,
          |  substr(p_name, 1, 8) AS name_pfx,
          |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
          |  concat_ws('|', p_brand, p_type) AS brand_type
          |FROM part ORDER BY p_partkey""".stripMargin)),

    // Date/time function battery.
    GraftQuery("q_date_funcs",
      (s, d) => orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 2).as("sum_total"))
        .orderBy("yr", "mon"),
      Some(
        s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           |  CAST(month(o_orderdate) AS BIGINT) AS mon,
           |  date_trunc('month', o_orderdate) AS month_start,
           |  count(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_total
           |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mon""".stripMargin)),

    // Conditional aggregation (CASE WHEN inside agg).
    GraftQuery("q_case_agg",
      (s, d) => orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_totalprice") > 100000.0, col("o_totalprice").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("big_total"))
        .orderBy("o_orderpriority"),
      Some(
        """SELECT o_orderpriority,
          |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
          |  CAST(sum(CASE WHEN o_totalprice > 100000.0 THEN CAST(o_totalprice AS DECIMAL(18,2))
          |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total
          |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ROLLUP (grouping sets). NULLS FIRST explicitly: Spark ASC defaults
    // nulls-first, DuckDB nulls-last.
    GraftQuery("q_rollup",
      (s, d) => lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some(
        s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
           |  ${dsumSql("l_quantity")} AS sum_qty
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // CUBE with grouping_id disambiguating aggregation level.
    GraftQuery("q_cube",
      (s, d) => lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("long").as("g"),
          count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "g", "n", "sum_qty")
        .orderBy(col("g"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some(
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g,
           |  count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY g, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // GROUPING SETS via the SQL surface (temp view + spark.sql).
    GraftQuery("q_grouping_sets",
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
            |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      Some(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Correlated EXISTS — Catalyst decorrelates to a left-semi join.
    GraftQuery("q_exists_subquery",
      (s, d) => {
        customer(s, d).createOrReplaceTempView("customer")
        orders(s, d).createOrReplaceTempView("orders")
        s.sql(
          """SELECT c_custkey, c_name FROM customer c
            |WHERE EXISTS (SELECT 1 FROM orders o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
            |ORDER BY c_custkey""".stripMargin)
      },
      Some(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
          |ORDER BY c_custkey""".stripMargin)),

    // Scalar subquery: parts pricier than the global mean retail price.
    // The mean is an exact decimal sum / count — deterministic in both
    // engines, so the > boundary is too.
    GraftQuery("q_scalar_subquery",
      (s, d) => {
        part(s, d).createOrReplaceTempView("part")
        s.sql(
          """SELECT p_partkey, p_retailprice FROM part
            |WHERE p_retailprice >
            |  (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM part)
            |ORDER BY p_partkey""".stripMargin)
      },
      Some(
        """SELECT p_partkey, p_retailprice FROM part
          |WHERE p_retailprice >
          |  (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM part)
          |ORDER BY p_partkey""".stripMargin)),

    // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, both R-7 linear interpolation), ulp-stabilized.
    GraftQuery("q_percentile",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          graft.functions.Stable.stab(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          graft.functions.Stable.stab(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          graft.functions.Stable.stab(expr("percentile(l_quantity, 0.9)"), 6).as("p90"))
        .orderBy("l_returnflag"),
      Some {
        import graft.functions.Stable.stabSql
        s"""SELECT l_returnflag,
           |  ${stabSql("quantile_cont(l_quantity, 0.25)", 6)} AS p25,
           |  ${stabSql("quantile_cont(l_quantity, 0.5)", 6)} AS p50,
           |  ${stabSql("quantile_cont(l_quantity, 0.9)", 6)} AS p90
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
      }),

    // min/max/avg + sample variance from exact decimal power sums —
    // identical IEEE arithmetic in both engines.
    GraftQuery("q_stats_agg",
      (s, d) => {
        val x = col("o_totalprice")
        val s1 = sum(x.cast("decimal(18,2)")).cast("double")
        val s2 = sum((x.cast("decimal(18,2)") * x.cast("decimal(18,2)"))).cast("double")
        val n = count(lit(1)).cast("double")
        orders(s, d).groupBy("o_orderpriority")
          .agg(min(x).as("min_total"), max(x).as("max_total"),
            (s1 / n).as("avg_total"),
            // stab(0): the s2 - s1²/n cancellation amplifies last-ulp
            // decimal→double divergence (~5e-15 relative) to ~1e-4 absolute
            // at var ≈ 2e10; integer stabilization gives both engines slack.
            graft.functions.Stable.stab((s2 - s1 * s1 / n) / (n - lit(1.0)), 0).as("var_total"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some {
        import graft.functions.Stable.stabSql
        val s1 = "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
        val s2 = "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
        val n = "CAST(count(*) AS DOUBLE)"
        s"""SELECT o_orderpriority,
           |  min(o_totalprice) AS min_total, max(o_totalprice) AS max_total,
           |  $s1 / $n AS avg_total,
           |  ${stabSql(s"($s2 - $s1 * $s1 / $n) / ($n - 1.0)", 0)} AS var_total,
           |  count(*) AS n
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
      }),

    // Explicit sort-merge join (merge hint): the strategy for two big
    // co-sorted sides where broadcast is impossible — exercised so strategy
    // control is covered, not just defaults.
    GraftQuery("q_sort_merge_join",
      (s, d) => {
        import org.apache.spark.sql.functions._
        lineitem(s, d).hint("merge")
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice"), 2).as("rev"))
          .orderBy("o_orderstatus")
      },
      Some(
        s"""SELECT o_orderstatus, count(*) AS n, ${dsumSql("l_extendedprice")} AS rev
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // RANGE window frame: running revenue over a value range (all orders
    // within 1000.0 of the current price), vs the ROWS frames elsewhere.
    GraftQuery("q_window_range_frame",
      (s, d) => {
        // fractional RANGE frames aren't expressible via Window.rangeBetween
        // (Long offsets only) — the SQL window surface is
        orders(s, d).selectExpr(
            "o_orderkey", "o_orderpriority", "o_totalprice",
            """CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              |  PARTITION BY o_orderpriority ORDER BY o_totalprice
              |  RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_total""".stripMargin)
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_orderpriority, o_totalprice,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          |    PARTITION BY o_orderpriority ORDER BY o_totalprice
          |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_total
          |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Ordered collect aggregation, surfaced as a join-safe string.
    GraftQuery("q_collect_agg",
      (s, d) => {
        import org.apache.spark.sql.functions._
        lineitem(s, d).groupBy("l_returnflag")
          .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",")
            .as("statuses"),
            countDistinct("l_linestatus").as("n_status"))
          .orderBy("l_returnflag")
      },
      Some(
        """SELECT l_returnflag,
          |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
          |  count(DISTINCT l_linestatus) AS n_status
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ntile + lead/lag: quartile bucketing and neighbor comparison.
    GraftQuery("q_ntile_lead",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
        orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).cast("long").as("quartile"),
            lead("o_orderkey", 1).over(w).as("next_key"),
            lag("o_orderkey", 1).over(w).as("prev_key"))
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_orderpriority,
          |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          |  lead(o_orderkey, 1) OVER w AS next_key,
          |  lag(o_orderkey, 1) OVER w AS prev_key
          |FROM orders
          |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
          |ORDER BY o_orderkey""".stripMargin)),

    // percent_rank / cume_dist — the two relative-position window
    // functions the suite didn't yet cover, over per-nation customer
    // balance totals partitioned by region (aggregate-sized partitions;
    // both ratios are exact small-integer divisions).
    GraftQuery("q_percent_rank_cume",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val bal = customer(s, d).groupBy("c_nationkey")
          .agg(dsum(col("c_acctbal"), 2).as("bal"))
        val j = bal.join(nation(s, d),
          col("c_nationkey") === col("n_nationkey"))
        val w = Window.partitionBy("n_regionkey")
          .orderBy(col("bal"), col("n_nationkey"))
        j.select(col("n_regionkey"), col("n_name"), col("bal"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("n_regionkey", "n_name")
      },
      Some(
        s"""WITH bal AS (
           |  SELECT c_nationkey, ${dsumSql("c_acctbal")} AS bal
           |  FROM customer GROUP BY c_nationkey)
           |SELECT n_regionkey, n_name, bal,
           |  percent_rank() OVER w AS pr,
           |  cume_dist() OVER w AS cd
           |FROM bal JOIN nation ON c_nationkey = n_nationkey
           |WINDOW w AS (PARTITION BY n_regionkey ORDER BY bal, n_nationkey)
           |ORDER BY n_regionkey, n_name""".stripMargin)),

    // Pivot: long→wide on a known small domain (linestatus F/O).
    GraftQuery("q_pivot",
      (s, d) => {
        import org.apache.spark.sql.functions._
        lineitem(s, d).groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(dsum(col("l_quantity"), 2))
          .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
          .orderBy("l_returnflag")
      },
      Some(
        """SELECT l_returnflag,
          |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
          |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Unpivot (wide→long): Spark's native unpivot vs DuckDB UNPIVOT.
    GraftQuery("q_unpivot",
      (s, d) => {
        import org.apache.spark.sql.functions._
        orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_custkey").cast("double").as("o_cust"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("o_totalprice"), col("o_cust")), "measure", "val")
          .orderBy("o_orderkey", "measure")
      },
      Some(
        """SELECT o_orderkey, measure, val FROM (
          |  SELECT o_orderkey, o_totalprice,
          |         CAST(o_custkey AS DOUBLE) AS o_cust
          |  FROM orders)
          |UNPIVOT (val FOR measure IN (o_totalprice, o_cust))
          |ORDER BY o_orderkey, measure""".stripMargin)),

    // first_value/last_value over an explicit full-partition frame.
    GraftQuery("q_first_last_window",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            first("o_orderkey").over(w).as("first_key"),
            last("o_orderkey").over(w).as("last_key"))
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_orderpriority,
          |  first_value(o_orderkey) OVER w AS first_key,
          |  last_value(o_orderkey) OVER w AS last_key
          |FROM orders
          |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
          |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          |ORDER BY o_orderkey""".stripMargin)),

    // Approximate sketches, EXACT-GATED (round 13 — retires the last
    // no_oracle row): the previous revision ran the engine-internal
    // HLL++ / percentile_approx, whose sketch states can never
    // hash-match another engine. This revision runs the same two jobs —
    // approximate distinct + approximate median — through DETERMINISTIC
    // sketches: a fixed-register HyperLogLog (Sketch.hllDistinct, m=64
    // registers over xxhash64, integer-exact register math) whose whole
    // register array the DuckDB twin replays bit-for-bit via XxhashSql,
    // and a histogram median (cumulative counts over the bounded
    // l_quantity grid — the deciles playbook, never a corpus sort). The
    // engine-native approx_count_distinct / percentile_approx remain
    // exercised and error-bounded in ApproxSpec; this registered query
    // is the cross-engine-checkable production form.
    GraftQuery("q_approx_sketches",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val li = lineitem(s, d)
        val hll = graft.operators.Sketch.hllDistinct(li, "l_returnflag", col("l_orderkey"))
        val hq = li.groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("c"))
        val med = hq
          .withColumn("cum",
            sum("c").over(Window.partitionBy("l_returnflag").orderBy("l_quantity")))
          .withColumn("n", sum("c").over(Window.partitionBy("l_returnflag")))
          .filter(col("cum") * 2 >= col("n"))
          .groupBy("l_returnflag")
          .agg(min("l_quantity").cast("double").as("median_qty"))
        hll.join(med, "l_returnflag").orderBy("l_returnflag")
      },
      Some {
        val m = "18446744073709551616"
        s"""WITH k0 AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem),
           |${XxhashSql.longChainCtes("h", "k0", Seq("l_returnflag"), Seq("l_orderkey"), "xh")},
           |hu AS (SELECT l_returnflag,
           |         CAST((CAST(xh AS HUGEINT) + $m) % $m AS UBIGINT) AS uh FROM hout),
           |hb AS (SELECT l_returnflag,
           |         CAST(uh // 288230376151711744 AS BIGINT) AS idx,
           |         CAST(uh % 288230376151711744 AS BIGINT) AS w FROM hu),
           |sm1 AS (SELECT l_returnflag, idx, w | (w >> 1) AS w1 FROM hb),
           |sm2 AS (SELECT l_returnflag, idx, w1 | (w1 >> 2) AS w2 FROM sm1),
           |sm3 AS (SELECT l_returnflag, idx, w2 | (w2 >> 4) AS w3 FROM sm2),
           |sm4 AS (SELECT l_returnflag, idx, w3 | (w3 >> 8) AS w4 FROM sm3),
           |sm5 AS (SELECT l_returnflag, idx, w4 | (w4 >> 16) AS w5 FROM sm4),
           |sm6 AS (SELECT l_returnflag, idx, w5 | (w5 >> 32) AS w6 FROM sm5),
           |hr AS (SELECT l_returnflag, idx, 59 - bit_count(w6) AS rho FROM sm6),
           |rg AS (SELECT l_returnflag, idx, max(rho) AS reg FROM hr GROUP BY 1, 2),
           |rg2 AS (SELECT l_returnflag, reg,
           |          max(reg) OVER (PARTITION BY l_returnflag) AS maxr FROM rg),
           |hg AS (SELECT l_returnflag, count(*) AS np, max(maxr) AS maxr,
           |         CAST(sum(reg) AS BIGINT) AS reg_sum,
           |         sum(CAST(1 AS BIGINT) << CAST(maxr - reg AS INT)) AS sp
           |       FROM rg2 GROUP BY 1),
           |hs AS (SELECT l_returnflag, np, maxr, reg_sum,
           |         sp + (64 - np) * CAST(CAST(1 AS BIGINT) << CAST(maxr AS INT) AS HUGEINT) AS stot
           |       FROM hg),
           |hrw AS (SELECT l_returnflag, np, maxr, reg_sum,
           |         CAST(0.709 AS DOUBLE) *
           |           (CAST(CAST(4096 AS HUGEINT) * (CAST(1 AS BIGINT) << CAST(maxr AS INT)) AS DOUBLE)
           |            / CAST(stot AS DOUBLE)) AS raw FROM hs),
           |he AS (SELECT l_returnflag, CAST(64 - np AS BIGINT) AS n_zero_regs,
           |         CAST(maxr AS BIGINT) AS max_rho, reg_sum,
           |         floor((CASE WHEN np < 64 AND raw <= 160.0
           |                THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / (64 - np))
           |                ELSE raw END) * 1000000.0 + 0.5) / 1000000.0 AS hll_est
           |       FROM hrw),
           |hm AS (SELECT l_returnflag, l_quantity, count(*) AS c FROM lineitem GROUP BY 1, 2),
           |hc AS (SELECT l_returnflag, l_quantity,
           |         sum(c) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cum,
           |         sum(c) OVER (PARTITION BY l_returnflag) AS n FROM hm),
           |md AS (SELECT l_returnflag, CAST(min(l_quantity) AS DOUBLE) AS median_qty
           |       FROM hc WHERE cum * 2 >= n GROUP BY 1)
           |SELECT he.l_returnflag, n_zero_regs, max_rho, reg_sum, hll_est, median_qty
           |FROM he JOIN md USING (l_returnflag) ORDER BY he.l_returnflag""".stripMargin
      }),

    // KMV distinct sketch — the hash-GATED approximate distinct (contrast:
    // q_approx_sketches' HLL++ is engine-internal, rows-only forever). The
    // sketch state is k concrete xxhash64 values, so the DuckDB twin
    // (XxhashSql's hashLong chain) reproduces the sketch, its threshold
    // element, and the stab(6) estimate exactly. See Sketch.kmvDistinct
    // for the bounded two-level k-min shape.
    GraftQuery("q_kmv_distinct",
      (s, d) => graft.operators.Sketch.kmvDistinct(
          lineitem(s, d), "l_returnflag", col("l_orderkey"), 64)
        .orderBy("l_returnflag"),
      Some {
        val m = "18446744073709551616"
        s"""WITH k0 AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem),
           |${XxhashSql.longChainCtes("h", "k0", Seq("l_returnflag"), Seq("l_orderkey"), "xh")},
           |u AS (SELECT DISTINCT l_returnflag,
           |        CAST((CAST(xh AS HUGEINT) + $m) % $m AS HUGEINT) AS uh FROM hout),
           |r AS (SELECT l_returnflag, uh,
           |        row_number() OVER (PARTITION BY l_returnflag ORDER BY uh) AS rn FROM u),
           |s AS (SELECT l_returnflag, count(*) AS n_kept, max(uh) AS kth
           |      FROM r WHERE rn <= 64 GROUP BY l_returnflag)
           |SELECT l_returnflag, n_kept, CAST(kth AS VARCHAR) AS kth_uh,
           |  CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
           |       ELSE floor((63.0 * $m.0 / CAST(kth AS DOUBLE))*1000000.0+0.5)/1000000.0
           |  END AS est_distinct
           |FROM s ORDER BY l_returnflag""".stripMargin
      }),

    // Two-phase salted aggregation (Skew.twoPhaseSum): same answer as the
    // plain GROUP BY (the oracle), but the heavy shuffle is split 8 ways —
    // the rewrite for hot low-cardinality keys. count + exact decimal sum
    // re-aggregate losslessly (partials are themselves summable).
    GraftQuery("q_skew_agg",
      (s, d) => {
        import org.apache.spark.sql.functions._
        graft.operators.Skew.twoPhaseSum(
            lineitem(s, d), Seq("l_returnflag"), salt = 8,
            sumCols = Seq(
              "n" -> count(lit(1)),
              "sum_qty_dec" -> sum(col("l_quantity").cast("decimal(18,2)"))),
            idCols = Seq(col("l_orderkey"), col("l_linenumber")))
          .select(col("l_returnflag"), col("n"),
            col("sum_qty_dec").cast("double").as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some(
        s"""SELECT l_returnflag, count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Salted join (Skew.saltedJoin): big side salted by row identity, small
    // side replicated — row-identical to the plain join the oracle runs.
    GraftQuery("q_skew_join",
      (s, d) => {
        import org.apache.spark.sql.functions._
        val cust = customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
        graft.operators.Skew.saltedJoin(
            orders(s, d), cust, "o_custkey", salt = 8,
            bigIdCols = Seq(col("o_orderkey")))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("sum_total"))
          .orderBy("c_nationkey")
      },
      Some(
        s"""SELECT c_nationkey, count(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_total
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Bucketed co-located join: orders and customer written CLUSTERED BY
    // custkey into the same bucket count, so the fact-fact join needs NO
    // exchange on either side — the scans themselves are hash-partitioned
    // on the join key — and the same-key aggregate after it reuses that
    // partitioning too (zero hashpartitioning exchanges in the whole plan;
    // locked by PlanShapeSpec). This is the pre-shuffled layout a 100 TB
    // pipeline maintains for its repeatedly-joined fact tables: pay one
    // clustered write, then every downstream join/agg on that key is
    // shuffle-free. The merge hint keeps the demo honest at test SF, where
    // AQE would otherwise broadcast the small side.
    GraftQuery("q_bucketed_join",
      (s, d) => {
        val key = d.replaceAll("[^A-Za-z0-9]", "_")
        val (ot, ct) = (s"orders_bkt_$key", s"customer_bkt_$key")
        if (!s.catalog.tableExists(ot)) {
          orders(s, d).write.mode("overwrite")
            .bucketBy(8, "o_custkey").sortBy("o_custkey")
            .option("path", s"/tmp/graft-bucketed/$key/orders").saveAsTable(ot)
          customer(s, d).write.mode("overwrite")
            .bucketBy(8, "c_custkey").sortBy("c_custkey")
            .option("path", s"/tmp/graft-bucketed/$key/customer").saveAsTable(ct)
        }
        s.table(ot).join(s.table(ct).hint("merge"),
            col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment") === "BUILDING")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2).as("sum_price"))
          .orderBy("o_custkey")
      },
      Some(
        s"""SELECT o_custkey, count(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // Correlated LATERAL top-N — a SQL shape the DataFrame API can't
    // express directly (per-row dependent subquery with ORDER BY/LIMIT);
    // Spark decorrelates it into a ranked join. Same text runs in DuckDB.
    GraftQuery("q_lateral_topn",
      (s, d) => {
        customer(s, d).createOrReplaceTempView("customer")
        orders(s, d).createOrReplaceTempView("orders")
        s.sql(lateralTopnSql)
      },
      Some(lateralTopnSql))
  )

  /** Shared verbatim by the Spark and DuckDB sides of q_lateral_topn. */
  val lateralTopnSql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_custkey <= 100
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin
}
