package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Relational coverage queries (SURVEY.md §2.1–§2.10): scans, projections,
  * filters, joins, aggregations, windows, sorts, set ops, scalar functions.
  *
  * Conventions (driver hash-compare, see QueryDef):
  *  - every query ends in a deterministic ORDER BY over a unique key;
  *  - double aggregates are round()ed identically on both sides;
  *  - timestamps are never emitted raw — formatted to strings;
  *  - oracle ORDER BY uses NULLS FIRST to match Spark's asc default.
  *
  * Scale notes are per-query: the sfDir tables are small, but each plan is
  * written as it should run on 100 TB (broadcast the dims, let filters push
  * into the parquet scan, aggregate partial-first).
  */
object Relational {

  /** Scale-stable money sum. A plain double sum is association-order
    * dependent: at sf1 (6M rows) the accumulated ulp drift between
    * Spark's partition tree and DuckDB's sequential sum reached the
    * last ROUNDED digit (±0.01 on ~10¹⁰ totals — the r11 rehearsal's
    * q06 drift). The inputs are 2-decimal money, and products of
    * two/three such factors are exactly 4/6-decimal values the double
    * product approximates within ulps — so casting each row to
    * DECIMAL(18,scale) recovers the IDENTICAL exact grid point on both
    * engines (never a rounding tie: the true value sits ON the grid),
    * and the decimal sum is exact integer arithmetic, associative, and
    * therefore bit-stable under any partitioning at any SF. Cast back
    * to double for a schema both engines agree on.
    */
  private def moneySum(e: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    // r19 optimization (guide §4): the double→decimal(18,s) cast allocated
    // a java BigDecimal per row (~0.35 s per cast-sum over 600k rows —
    // q01 carries four); MoneyDecimal is the same mathematical function
    // computed allocation-free in 128-bit integer arithmetic, proven
    // bit-identical to the Cast by MoneyDecimalSpec. The sum sees the
    // same decimal(18,s) input type, so results are unchanged.
    sum(org.apache.spark.sql.graft.GraftExpressions.moneyDecimal(e, scale)).cast("double")

  /** DuckDB mirror of [[moneySum]]. */
  private def moneySumSql(expr: String, scale: Int): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  val all: Seq[QueryDef] = Seq(

    // ── A1/§2.6: TPC-H Q1 shape — scan-side partial agg, 6-group output.
    // At 100 TB this is a pure map-side-combine aggregation; no skew risk
    // (6 groups), filter pushed to parquet row groups via l_shipdate stats.
    QueryDef(
      "q01_pricing_summary",
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               round(${moneySumSql("l_quantity", 2)}, 2) AS sum_qty,
               round(${moneySumSql("l_extendedprice", 2)}, 2) AS sum_base_price,
               round(${moneySumSql("l_extendedprice * (1 - l_discount)", 4)}, 2) AS sum_disc_price,
               round(${moneySumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}, 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""))( (spark, dir) =>
      lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(moneySum(col("l_quantity"), 2), 2).as("sum_qty"),
          round(moneySum(col("l_extendedprice"), 2), 2).as("sum_base_price"),
          round(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("sum_disc_price"),
          round(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    ),

    // ── A1: value_counts() — histogram, desc-sorted (dop.py:26 analogue).
    QueryDef(
      "q02_returnflag_hist",
      Some("""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem GROUP BY l_returnflag
        ORDER BY n DESC, l_returnflag"""))( (spark, dir) =>
      lineitem(spark, dir)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l_returnflag"))
    ),

    // ── F*/P4/§2.4: filter + narrow projection. Both predicate and the
    // 4-column ReadSchema must reach the parquet scan (verified via
    // .explain: PushedFilters + pruned schema).
    QueryDef(
      "q03_filter_project",
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
          AND l_quantity > 45
        ORDER BY l_orderkey, l_linenumber"""))( (spark, dir) =>
      lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-02-01").cast("timestamp")
          && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    ),

    // ── P1/§2.3: static dict-lookup projection (CLASS_ID_TO_CLASS_NAME,
    // hg/CONSTANTS.py:4-13 shape) via a literal map — constant-folded by
    // Catalyst, no join, no shuffle beyond the final agg.
    QueryDef(
      "q04_dict_lookup",
      Some("""
        SELECT CASE l_returnflag WHEN 'R' THEN 'returned'
                                 WHEN 'A' THEN 'accepted'
                                 WHEN 'N' THEN 'none' END AS flag_name,
               count(*) AS n
        FROM lineitem GROUP BY 1 ORDER BY flag_name"""))( (spark, dir) => {
      val m = typedLit(Map("R" -> "returned", "A" -> "accepted", "N" -> "none"))
      lineitem(spark, dir)
        .select(element_at(m, col("l_returnflag")).as("flag_name"))
        .groupBy(col("flag_name")).agg(count(lit(1)).as("n"))
        .orderBy(col("flag_name"))
    }),

    // ── J1/§2.5: broadcast equi-join — customer is the small side (dim);
    // at 100 TB orders is the fact, customer broadcast avoids the shuffle.
    QueryDef(
      "q05_broadcast_join",
      Some(s"""
        SELECT c_mktsegment, round(${moneySumSql("o_totalprice", 2)}, 2) AS revenue, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""))( (spark, dir) =>
      orders(spark, dir)
        .join(broadcast(customer(spark, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(moneySum(col("o_totalprice"), 2), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    ),

    // ── §2.5 star join: one fact (lineitem) + chained dims, all broadcast.
    // Catalyst folds the dim chain into successive BroadcastHashJoins; the
    // only shuffle is the final 2-level groupBy.
    QueryDef(
      "q06_star_join",
      Some(s"""
        SELECT r_name, year(o_orderdate) AS oyear,
               round(${moneySumSql("l_extendedprice * (1 - l_discount)", 4)}, 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, oyear
        ORDER BY r_name, oyear"""))( (spark, dir) =>
      lineitem(spark, dir)
        .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(spark, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("oyear"))
        .agg(round(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4), 2).as("revenue"))
        .orderBy(col("r_name"), col("oyear"))
    ),

    // ── A4/§2.7: argmax row per group (group.loc[score.idxmax()],
    // slg.py:157) — row_number over (key) ordered desc with the reference's
    // first-wins tie-break made explicit (l_linenumber).
    QueryDef(
      "q07_argmax_per_group",
      Some("""
        SELECT l_orderkey AS okey, l_partkey AS best_partkey,
               round(l_extendedprice, 2) AS best_price
        FROM (SELECT l_orderkey, l_partkey, l_extendedprice,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_linenumber, l_partkey) AS rn
              FROM lineitem) t
        WHERE rn = 1 ORDER BY okey"""))( (spark, dir) => {
      // r19 (guide §2.4/§4: codegen-friendly aggregation over a
      // sort-based window): row_number-top-1 sorted the whole relation
      // map-side (single-split scan → ONE task sorting 600k rows,
      // profiled at ~1.0 s wall ≈ single-thread time). The same row is
      // min_by over the ordering key struct (−price, linenumber,
      // partkey) — a DeclarativeAggregate with map-side partials, no
      // sorts except the final okey ORDER BY. Determinism: on a full
      // ordering-key tie the output columns (partkey, price) are
      // components of the key itself, so the selected row's projection
      // is unique even though lineitem carries duplicate
      // (l_orderkey, l_linenumber) pairs.
      lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(min_by(
          struct(col("l_partkey"), col("l_extendedprice")),
          struct((-col("l_extendedprice")).as("np"), col("l_linenumber"),
            col("l_partkey"))).as("best"))
        .select(col("l_orderkey").as("okey"),
          col("best.l_partkey").as("best_partkey"),
          round(col("best.l_extendedprice"), 2).as("best_price"))
        .orderBy(col("okey"))
    }),

    // ── §2.7 window surface: rank + lag over a unique total order.
    QueryDef(
      "q08_rank_lag",
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               rank() OVER w AS rk,
               round(coalesce(lag(l_extendedprice) OVER w, -1.0), 2) AS prev_price
        FROM lineitem
        WHERE l_suppkey <= 3
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice)
        ORDER BY l_suppkey, rk, l_orderkey, l_linenumber, prev_price"""))( (spark, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      lineitem(spark, dir)
        .filter(col("l_suppkey") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          rank().over(w).cast("long").as("rk"),
          round(coalesce(lag(col("l_extendedprice"), 1).over(w), lit(-1.0)), 2).as("prev_price"))
        .orderBy(col("l_suppkey"), col("rk"), col("l_orderkey"), col("l_linenumber"), col("prev_price"))
    }),

    // ── §2.7 running frame: cumulative sum over a unique total order.
    QueryDef(
      "q09_running_sum",
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        FROM lineitem
        WHERE l_suppkey <= 3
        ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty"""))( (spark, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(spark, dir)
        .filter(col("l_suppkey") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(col("l_quantity")).over(w), 2).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
    }),

    // ── §2.8 sort/limit: global top-k. Spark plans TakeOrderedAndProject —
    // per-partition top-k then a single-reduce merge; no full sort at scale.
    QueryDef(
      "q10_topk_orders",
      Some("""
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50"""))( (spark, dir) =>
      orders(spark, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
    ),

    // ── A9/§2.6: distinct (df['file_name'].unique() analogue).
    QueryDef(
      "q11_distinct",
      Some("""
        SELECT DISTINCT c_nationkey, c_mktsegment
        FROM customer ORDER BY c_nationkey, c_mktsegment"""))( (spark, dir) =>
      customer(spark, dir)
        .select(col("c_nationkey"), col("c_mktsegment")).distinct()
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    ),

    // ── A6/§2.9: union-all (pd.concat, slg.py:129,193) + re-aggregate.
    QueryDef(
      "q12_union_all",
      Some(s"""
        SELECT src, count(*) AS n, round(${moneySumSql("v", 2)}, 2) AS total
        FROM (
          SELECT 'high' AS src, o_totalprice AS v FROM orders WHERE o_totalprice > 300000
          UNION ALL
          SELECT 'urgent' AS src, o_totalprice AS v FROM orders WHERE o_orderpriority = '1-URGENT'
        ) u GROUP BY src ORDER BY src"""))( (spark, dir) => {
      val o = orders(spark, dir)
      val high = o.filter(col("o_totalprice") > 300000)
        .select(lit("high").as("src"), col("o_totalprice").as("v"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(lit("urgent").as("src"), col("o_totalprice").as("v"))
      high.unionByName(urgent)
        .groupBy(col("src")).agg(count(lit(1)).as("n"), round(moneySum(col("v"), 2), 2).as("total"))
        .orderBy(col("src"))
    }),

    // ── §2.9 set ops (additive per SURVEY): INTERSECT of two key sets.
    QueryDef(
      "q13_intersect",
      Some("""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        ORDER BY o_custkey"""))( (spark, dir) => {
      val o = orders(spark, dir)
      o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .intersect(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // ── §2.9 EXCEPT.
    QueryDef(
      "q14_except",
      Some("""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        ORDER BY o_custkey"""))( (spark, dir) => {
      val o = orders(spark, dir)
      o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .except(o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }
    ),

    // ── §2.5 semi-join (EXISTS): customers holding an open order.
    QueryDef(
      "q15_semi_join",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey"""))( (spark, dir) => {
      val open = orders(spark, dir).filter(col("o_orderstatus") === "P")
      customer(spark, dir)
        .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ── §2.5 anti-join (NOT EXISTS): customers with no urgent order.
    QueryDef(
      "q16_anti_join",
      Some("""
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey"""))( (spark, dir) => {
      val urgent = orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
      customer(spark, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // ── J4/§2.5: the reference's one theta-join — all pairs within a group
    // under an inequality predicate (bbox_grouping.py:14-23 IoU matrix
    // analogue: price-band overlap within an order). The equi-conjunct on
    // l_orderkey keeps it a shuffled hash join + partition-local pairing,
    // never a cross join — same shape that grouping needs at 100 TB.
    QueryDef(
      "q17_selfjoin_band",
      Some("""
        SELECT a.l_orderkey AS okey, count(*) AS n_pairs
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_linenumber < b.l_linenumber
         AND abs(a.l_extendedprice - b.l_extendedprice) < 1000
        GROUP BY 1 ORDER BY okey"""))( (spark, dir) => {
      val li = lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      // r20 (guide §3.1, pick the strategy deliberately): at gate SFs the
      // compressed-size estimate puts the whole relation under the
      // auto-broadcast threshold, so the planner collected and hashed
      // 600k rows single-threaded on the driver to broadcast a side that
      // is NOT small — measured 1.14-1.25 s vs 0.80-0.86 s for the
      // shuffled strategies (same-JVM ABA, min-of-3). The merge hint is
      // also the strategy the planner itself picks one decade up (the
      // estimate exceeds the threshold), so the plan is now uniform
      // across scales instead of flipping to a driver bottleneck exactly
      // at bench scale.
      val a = li.alias("a")
      val b = li.hint("merge").alias("b")
      a.join(b,
          col("a.l_orderkey") === col("b.l_orderkey")
            && col("a.l_linenumber") < col("b.l_linenumber")
            && abs(col("a.l_extendedprice") - col("b.l_extendedprice")) < 1000)
        .groupBy(col("a.l_orderkey").as("okey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("okey"))
    }),

    // ── J3/§2.5: positional zip-join — arrays_zip + posexplode over
    // per-group collected arrays (bboxes[i] ↔ scores[i], slg.py:60-74).
    // Oracle expresses the same rows via row_number arithmetic.
    QueryDef(
      "q18_zip_explode",
      Some("""
        SELECT l_orderkey AS okey,
               row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) - 1 AS pos,
               l_linenumber AS lineno, l_quantity AS qty
        FROM lineitem WHERE l_orderkey <= 500
        ORDER BY okey, pos"""))( (spark, dir) => {
      val li = lineitem(spark, dir).filter(col("l_orderkey") <= 500)
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("items"))
        .select(col("l_orderkey").as("okey"),
          posexplode(arrays_zip(col("items.l_linenumber"), col("items.l_quantity"))))
        .select(col("okey"), col("pos").cast("long").as("pos"),
          col("col.l_linenumber").as("lineno"), col("col.l_quantity").as("qty"))
        .orderBy(col("okey"), col("pos"))
    }),

    // ── §2.3 conditional projection + conditional aggregation.
    QueryDef(
      "q19_case_when",
      Some("""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               count(*) AS n,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled
        FROM orders GROUP BY 1 ORDER BY bucket"""))( (spark, dir) =>
      orders(spark, dir)
        .select(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large").as("bucket"),
          col("o_orderstatus"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_filled"))
        .orderBy(col("bucket"))
    ),

    // ── §2.10 strings: split / substring / upper / length / concat
    // (slg.py:54,56,184 analogues).
    QueryDef(
      "q20_string_funcs",
      Some("""
        SELECT p_partkey,
               upper(p_brand) AS brand_uc,
               string_split(p_name, ' ')[1] AS first_word,
               length(p_name) AS name_len,
               p_brand || '/' || p_type AS brand_type,
               substr(p_name, 1, 3) AS name3
        FROM part WHERE p_partkey <= 100 ORDER BY p_partkey"""))( (spark, dir) =>
      part(spark, dir).filter(col("p_partkey") <= 100)
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          substring(col("p_name"), 1, 3).as("name3"))
        .orderBy(col("p_partkey"))
    ),

    // ── §2.10 math: radians / atan2 / positive-mod / sqrt (M1/M17 shapes:
    // pmod(degrees(atan2(y,x)),360) is the wall-azimuth formula, mwe.py:30-32).
    QueryDef(
      "q21_math_funcs",
      Some("""
        SELECT event_id,
               round(radians(value), 6) AS rad,
               round(degrees(atan2(value, 100.0)), 6) AS azim,
               round(((degrees(atan2(value - 245.0, 100.0)) % 360) + 360) % 360, 6) AS azim_mod,
               round(sqrt(abs(value)), 6) AS rt,
               CAST(floor(value / 50) AS BIGINT) AS bucket
        FROM events WHERE event_id <= 200 ORDER BY event_id"""))( (spark, dir) =>
      events(spark, dir).filter(col("event_id") <= 200)
        .select(col("event_id"),
          round(radians(col("value")), 6).as("rad"),
          round(degrees(atan2(col("value"), lit(100.0))), 6).as("azim"),
          round(pmod(degrees(atan2(col("value") - 245.0, lit(100.0))), lit(360)), 6).as("azim_mod"),
          round(sqrt(abs(col("value"))), 6).as("rt"),
          floor(col("value") / 50).as("bucket"))
        .orderBy(col("event_id"))
    ),

    // ── §1.2 timestamps: year/month/quarter/trunc — emitted as strings so
    // the compare never sees raw timestamp encodings.
    QueryDef(
      "q22_date_funcs",
      Some("""
        SELECT year(o_orderdate) AS oyear, month(o_orderdate) AS omonth,
               quarter(o_orderdate) AS oquarter,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               count(*) AS n
        FROM orders
        GROUP BY 1, 2, 3, 4
        ORDER BY oyear, omonth"""))( (spark, dir) =>
      orders(spark, dir)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("oyear"),
          month(col("o_orderdate")).cast("long").as("omonth"),
          quarter(col("o_orderdate")).cast("long").as("oquarter"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("oyear"), col("omonth"))
    ),

    // ── S1/S5 analogue: JSON scalar extraction from events.props.
    QueryDef(
      "q23_json_extract",
      Some("""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""))( (spark, dir) =>
      events(spark, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_total"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    ),

    // ── §2.6 scalar subquery: orders above the global mean. Spark plans the
    // singleton agg as a broadcast nested-loop against the filter — constant
    // per executor, scan stays distributed.
    QueryDef(
      "q24_scalar_subquery",
      Some("""
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey"""))( (spark, dir) => {
      val o = orders(spark, dir)
      val threshold = o.agg((avg(col("o_totalprice")) * 1.8).as("thr"))
      o.join(broadcast(threshold))
        .filter(col("o_totalprice") > col("thr"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderkey"))
    }),

    // ── A4 via max_by (the non-window argmax spelling; groupBy.agg path —
    // single shuffle, no sort). Tie-broken by c_custkey for determinism.
    QueryDef(
      "q25_max_by",
      Some("""
        SELECT c_nationkey, c_name AS top_customer,
               round(mx, 2) AS top_balance
        FROM (SELECT c_nationkey, c_name,
                     max(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx,
                     row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
              FROM customer) t
        WHERE rn = 1 ORDER BY c_nationkey"""))( (spark, dir) =>
      customer(spark, dir)
        .groupBy(col("c_nationkey"))
        .agg(
          max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("top_customer"),
          round(max(col("c_acctbal")), 2).as("top_balance"))
        .orderBy(col("c_nationkey"))
    ),

    // ── §2.6 rollup (additive coverage). Group cols coalesced to 'ALL' so
    // the output carries no NULLs (Spark and DuckDB disagree on default
    // NULL sort placement).
    QueryDef(
      "q26_rollup",
      Some(s"""
        SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS oyear,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n, round(${moneySumSql("o_totalprice", 2)}, 2) AS total
        FROM orders
        GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
        ORDER BY oyear, status"""))( (spark, dir) =>
      orders(spark, dir)
        .select(year(col("o_orderdate")).as("y"), col("o_orderstatus"), col("o_totalprice"))
        .rollup(col("y"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(moneySum(col("o_totalprice"), 2), 2).as("total"))
        .select(
          coalesce(col("y").cast("string"), lit("ALL")).as("oyear"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("total"))
        .orderBy(col("oyear"), col("status"))
    ),

    // ── A10/§2.6 count-distinct (exact; approx_count_distinct is declared
    // separately without an oracle).
    QueryDef(
      "q27_count_distinct",
      Some("""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))( (spark, dir) =>
      lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy(col("l_returnflag"))
    )
  )
}
