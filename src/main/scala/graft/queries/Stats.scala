package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Distribution statistics: exact percentiles, stddev/variance, cube
  * grouping — aggregation-surface depth beyond SURVEY §2.6 (additive).
  * Sketch ESTIMATES are engine-specific and can't be value-compared, so
  * q39 oracles their error-band guarantees instead (see its comment);
  * the exact forms (q36) are oracled value-for-value.
  */
object Stats {

  val all: Seq[QueryDef] = Seq(

    // ── Exact interpolated percentiles per group. Spark `percentile`
    // and DuckDB `quantile_cont` share the rank = p·(n−1) linear
    // interpolation, so doubles agree to rounding.
    //
    // SCALE CONTRACT (VERDICT r11 #8): exact percentile buffers every
    // group value in ONE aggregation buffer — with 3 `l_returnflag`
    // groups, a 100×-scale group is one executor's memory. That trade
    // is deliberate here (oracle parity demands exactness; the group
    // count is a fixed enum). The regimes that scale are the other two
    // members of this family: q107 (exact percentiles grouped by a
    // HIGH-CARDINALITY key, so buffers stay at n/groups) and q39 (the
    // mergeable-sketch path for corpus-sized groups).
    QueryDef(
      "q36_percentiles",
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
               round(stddev_samp(l_extendedprice), 4) AS sd,
               round(var_samp(l_extendedprice), 4) AS var
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""))( (spark, dir) => {
      // r19 (guide §1.2 per-task work): the built-in `percentile`
      // aggregate buffers a boxed value→count OpenHashMap — profiled at
      // ~1.5 s single-threaded for the 600k-row group set, and the cost
      // is the boxing/merge, not the row count (a 32-way fan-out of the
      // same aggregate measured SLOWER: the final map merge is the same
      // 600k inserts single-threaded, plus a repartition shuffle).
      // sort_array(collect_list(...)) builds the identical sorted
      // multiset with flat array appends + one primitive sort, and the
      // rank interpolation below mirrors Percentile.getPercentile
      // term-for-term (position = p·(n−1); lower/higher = floor/ceil;
      // result = lv·(h−pos) + hv·(pos−l), the degenerate h == l case
      // returning the exact element) — multiplication/addition operand
      // order is commutative bitwise in IEEE, so the emitted doubles are
      // bit-identical to the percentile aggregate's. stddev/var stay in
      // the SAME single aggregate over the unfanned scan: one partial
      // buffer per group, the exact merge order the atol=0 oracle
      // matched before.
      def pct(p: Double) = {
        val pos = lit(p) * (size(col("sorted")) - 1).cast("double")
        val l = floor(pos)
        val h = ceil(pos)
        val lv = element_at(col("sorted"), (l + 1).cast("int"))
        val hv = element_at(col("sorted"), (h + 1).cast("int"))
        when(l === h, lv)
          .otherwise(lv * (h.cast("double") - pos) + hv * (pos - l.cast("double")))
      }
      lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          sort_array(collect_list(col("l_extendedprice"))).as("sorted"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd"),
          round(var_samp(col("l_extendedprice")), 4).as("var"))
        .select(col("l_returnflag"),
          round(pct(0.5), 4).as("p50"),
          round(pct(0.9), 4).as("p90"),
          round(pct(0.99), 4).as("p99"),
          col("sd"), col("var"))
        .orderBy(col("l_returnflag"))
    }),

    // ── q36's many-groups regime (VERDICT r11 #8): exact percentiles
    // grouped by a HIGH-CARDINALITY bucket key (256 part-key buckets),
    // where each aggregation buffer holds n/256 values — the shape that
    // survives a 100× scale-up because buffer size, not group count,
    // stays bounded: buckets shrink relative to executor memory as the
    // cluster scales out with the data. Same exact-interpolation parity
    // as q36, exercised where the buffers are small.
    QueryDef(
      "q107_bucket_percentiles",
      Some("""
        SELECT l_partkey % 256 AS bkt, count(*) AS n,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        FROM lineitem GROUP BY 1 ORDER BY bkt"""))( (spark, dir) => {
      // r19: same boxed-OpenHashMap replacement as q36 (sorted-array
      // buffer + the mirrored interpolation); per-bucket arrays are
      // n/256, exactly the bounded-buffer regime this query documents.
      def pct(p: Double) = {
        val pos = lit(p) * (size(col("sorted")) - 1).cast("double")
        val l = floor(pos)
        val h = ceil(pos)
        val lv = element_at(col("sorted"), (l + 1).cast("int"))
        val hv = element_at(col("sorted"), (h + 1).cast("int"))
        when(l === h, lv)
          .otherwise(lv * (h.cast("double") - pos) + hv * (pos - l.cast("double")))
      }
      lineitem(spark, dir)
        .groupBy((col("l_partkey") % 256).as("bkt"))
        .agg(count(lit(1)).as("n"),
          sort_array(collect_list(col("l_extendedprice"))).as("sorted"))
        .select(col("bkt"), col("n"),
          round(pct(0.5), 4).as("p50"),
          round(pct(0.9), 4).as("p90"))
        .orderBy(col("bkt"))
    }),

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

    // ── Approximate-sketch scale path, fully oracled via tolerance
    // bands: q36's exact `percentile` buffers every value per group — the
    // 100 TB path is the mergeable sketch (GK quantile summaries /
    // HLL++), whose estimates are engine-specific and can't be compared
    // value-for-value. So the query emits the GUARANTEE, not the
    // estimate: for each group × metric, whether the sketch result lands
    // inside its published error band, judged against exact ranks/counts
    // computed alongside. The oracle asserts `true` for every row — a
    // broken sketch hash-fails, a working one matches. (The exact
    // rank/ndv sides exist only to referee the sketch; production reads
    // the approx columns alone.)
    //
    // approx_percentile(accuracy=10000): rank error ≤ n/10000; checked
    // two-sided with 2× margin (+2 for rank-definition slack) against the
    // duplicate-aware rank interval [cnt_lt+1, cnt_le].
    // approx_count_distinct(rsd=0.05): |est − exact| ≤ 3σ = 15%.
    QueryDef(
      "q39_approx_sketches",
      Some("""
        SELECT l_returnflag, m.metric, true AS within_bound
        FROM (SELECT DISTINCT l_returnflag FROM lineitem) flags,
             (SELECT unnest(['ndv', 'p50', 'p90']) AS metric) m
        ORDER BY l_returnflag, metric"""))( (spark, dir) => {
      val li = lineitem(spark, dir)
      val accuracy = 10000
      // r19 (guide §1.2: don't scan what you can fold): the sketch pass
      // and the ndv referee ran as two separate lineitem aggregations —
      // one groupBy computes all four (same partials, same single-split
      // scan order, so the sketch estimates are unchanged), and the ndv
      // rows project out of it. Scans: 3 → 2 (the rank referee below
      // still needs its own pass against the broadcast estimates).
      val ap = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.9)),
          lit(accuracy)).as("ap"), count(lit(1)).as("n"),
          approx_count_distinct(col("l_partkey"), 0.05).as("acd"),
          countDistinct(col("l_partkey")).as("ed"))
      val pq = ap.select(col("l_returnflag"), col("n"),
          posexplode(col("ap")).as(Seq("qi", "av")))
        .withColumn("q", element_at(array(lit(0.5), lit(0.9)), col("qi") + 1))
      val tol = col("n") * 2.0 / accuracy + lit(2.0)
      val pcheck = li.join(broadcast(pq), "l_returnflag")
        .groupBy(col("l_returnflag"), col("q"), col("av"), col("n"))
        .agg(
          sum(when(col("l_extendedprice") < col("av"), 1L).otherwise(0L)).as("cnt_lt"),
          sum(when(col("l_extendedprice") <= col("av"), 1L).otherwise(0L)).as("cnt_le"))
        .select(col("l_returnflag"),
          concat(lit("p"), (col("q") * 100).cast("int").cast("string")).as("metric"),
          (col("q") * col("n") >= col("cnt_lt") + 1 - tol
            && col("q") * col("n") <= col("cnt_le") + tol).as("within_bound"))
      val ndv = ap
        .select(col("l_returnflag"), lit("ndv").as("metric"),
          (abs(col("acd") - col("ed")) <= col("ed") * 0.15).as("within_bound"))
      pcheck.unionByName(ndv).orderBy(col("l_returnflag"), col("metric"))
    }),

    // ── Pivot: long→wide reshape (groupBy().pivot() with explicit value
    // list — the explicit list matters at scale: without it Spark runs a
    // distinct-values job first AND the output schema becomes data-
    // dependent). Oracle spells the same thing as conditional aggregation.
    QueryDef(
      "q46_pivot",
      Some("""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f_qty,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_qty,
               count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS f_n,
               count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS o_n
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""))( (spark, dir) =>
      lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"),
          count(col("l_quantity")).as("n"))
        .select(col("l_returnflag"),
          col("F_qty").as("f_qty"), col("O_qty").as("o_qty"),
          col("F_n").as("f_n"), col("O_n").as("o_n"))
        .orderBy(col("l_returnflag"))),

    // ── Unpivot: wide→long reshape via the typed unpivot API (stack
    // shape) — map-only at any scale. Oracle as UNION ALL of the columns.
    QueryDef(
      "q47_unpivot",
      Some("""
        WITH wide AS (
          SELECT l_returnflag,
                 round(sum(l_quantity), 2) AS qty,
                 round(sum(l_extendedprice), 2) AS price
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag, 'qty' AS metric, qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'price', price FROM wide
        ORDER BY l_returnflag, metric"""))( (spark, dir) =>
      lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("price"))
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("price")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))),

    // ── Explicit GROUPING SETS (beyond q26 rollup / q37 cube): an
    // arbitrary, non-hierarchical set list with GROUPING() flags.
    QueryDef(
      "q48_grouping_sets",
      Some("""
        SELECT coalesce(l_returnflag, '<all>') AS flag,
               coalesce(l_linestatus, '<all>') AS status,
               grouping(l_returnflag)::BIGINT AS g_flag,
               grouping(l_linestatus)::BIGINT AS g_status,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY flag, status, g_flag, g_status"""))( (spark, dir) => {
      lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
      spark.sql("""
        SELECT coalesce(l_returnflag, '<all>') AS flag,
               coalesce(l_linestatus, '<all>') AS status,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY flag, status, g_flag, g_status""")
    }),

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
