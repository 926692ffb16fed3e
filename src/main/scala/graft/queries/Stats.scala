package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Distribution statistics: exact percentiles, stddev/variance, cube
  * grouping — aggregation-surface depth beyond SURVEY §2.6 (additive).
  * approx_count_distinct / sketches are deliberately NOT oracled (the
  * HLL estimate differs by engine); the exact forms are.
  */
object Stats {

  val all: Seq[QueryDef] = Seq(

    // ── Exact interpolated percentiles per group. Spark `percentile`
    // and DuckDB `quantile_cont` share the rank = p·(n−1) linear
    // interpolation, so doubles agree to rounding.
    QueryDef(
      "q36_percentiles",
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
               round(stddev_samp(l_extendedprice), 4) AS sd,
               round(var_samp(l_extendedprice), 4) AS var
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""))( (spark, dir) =>
      lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90"),
          round(percentile(col("l_extendedprice"), lit(0.99)), 4).as("p99"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd"),
          round(var_samp(col("l_extendedprice")), 4).as("var"))
        .orderBy(col("l_returnflag"))),

    // ── CUBE over two dimensions (rollup exists as q26): all 4 grouping
    // combinations, null-marked subtotals, GROUPING() to disambiguate
    // real nulls from subtotal rows.
    QueryDef(
      "q37_cube",
      Some("""
        SELECT coalesce(l_returnflag, '<all>') AS flag,
               coalesce(l_linestatus, '<all>') AS status,
               grouping(l_returnflag)::BIGINT AS g_flag,
               grouping(l_linestatus)::BIGINT AS g_status,
               count(*) AS n, round(sum(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY flag, status, g_flag, g_status"""))( (spark, dir) =>
      lineitem(spark, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("status"),
          col("g_flag"), col("g_status"), col("n"), col("qty"))
        .orderBy(col("flag"), col("status"), col("g_flag"), col("g_status"))),

    // ── Histogram via width bucketing — the fixed-bin sketch shape that
    // scales as a single map-side pass + tiny shuffle.
    QueryDef(
      "q38_histogram",
      Some("""
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
               count(*) AS n, round(avg(value), 6) AS bin_avg
        FROM events GROUP BY 1 ORDER BY bin"""))( (spark, dir) =>
      events(spark, dir)
        .groupBy(floor(col("value") / 25.0).as("bin"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("bin_avg"))
        .orderBy(col("bin")))
  )
}
