package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Temporal join suite (north-star "custom operators Spark lacks"):
  * as-of join and range join over events × orders, each in its scalable
  * Spark shape with a DuckDB oracle (DuckDB has native ASOF JOIN, so the
  * semantics are independently pinned).
  */
object Temporal {

  val all: Seq[QueryDef] = Seq(

    // ── As-of join: for each event, the latest order of the same
    // customer with o_orderdate <= ts. Spark shape: UNION the two
    // streams tagged by side, one shuffle on the key, sort by (time,
    // side) inside the window, carry the last seen order forward with
    // last(ignoreNulls) — no join explosion, no per-row probe; this is
    // the 100 TB as-of layout (one shuffle + one sort, both linear).
    // Orders are pre-reduced to one row per (custkey, date) — max
    // o_orderkey — so equal-date ties are deterministic on both engines.
    QueryDef(
      "q28_asof_join",
      Some("""
        WITH ord AS (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY 1, 2)
        SELECT e.event_id, o.o_orderkey AS asof_orderkey
        FROM events e ASOF JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY event_id"""))( (spark, dir) => {
      val ord = orders(spark, dir)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .select(col("o_custkey").as("key"), col("o_orderdate").as("t"),
          lit(0).as("side"), col("o_orderkey"), lit(null).cast("long").as("event_id"))
      val ev = events(spark, dir)
        .select(col("user_id").as("key"), col("ts").as("t"),
          lit(1).as("side"), lit(null).cast("long").as("o_orderkey"),
          col("event_id"))
      val w = Window.partitionBy(col("key"))
        .orderBy(col("t"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ord.unionByName(ev)
        .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .filter(col("side") === 1 && col("asof_orderkey").isNotNull)
        .select(col("event_id"), col("asof_orderkey"))
        .orderBy(col("event_id"))
    }),

    // ── Range join: events falling inside each order's 5-day window.
    // Order windows are mapped deterministically into the events' time
    // span (orderdate's day-of-epoch mod 25 days after 2024-01-01 —
    // the testdata's orders and events don't overlap in real time).
    // Spark shape: both sides bucketed to 5-day epochs; a 5-day interval
    // spans ≤2 buckets, so orders explode to their covered buckets and
    // the join is EQUI on (customer, bucket) with the exact range as a
    // post-filter — a hash join at any scale, never a nested loop.
    QueryDef(
      "q29_range_join",
      Some("""
        WITH ow AS (
          SELECT o_orderkey, o_custkey,
                 (TIMESTAMP '2024-01-01' + (((datediff('day', DATE '1995-01-01', o_orderdate) % 25) + 25) % 25) * INTERVAL 1 DAY) AS w_start
          FROM orders)
        SELECT o.o_orderkey, count(*) AS n_events,
               round(sum(e.value), 6) AS total_value
        FROM ow o JOIN events e
          ON e.user_id = o.o_custkey
         AND e.ts >= o.w_start
         AND e.ts < o.w_start + INTERVAL '5 days'
        GROUP BY 1 ORDER BY o_orderkey"""))( (spark, dir) => {
      val bucketSec = 5L * 24 * 3600
      val wStart = to_timestamp(date_add(lit("2024-01-01").cast("date"),
        pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")), lit(25)).cast("int")))
      val o = orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), wStart.as("w_start"))
        .select(col("o_orderkey"), col("o_custkey"), col("w_start"),
          explode(sequence(
            floor(unix_timestamp(col("w_start")) / bucketSec),
            floor((unix_timestamp(col("w_start")) + bucketSec - 1) / bucketSec)))
            .as("bucket"))
      val e = events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          floor(unix_timestamp(col("ts")) / bucketSec).as("bucket"))
      o.join(e, o("o_custkey") === e("user_id") && o("bucket") === e("bucket")
          && e("ts") >= o("w_start")
          && e("ts") < o("w_start") + expr("INTERVAL 5 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("total_value"))
        .orderBy(col("o_orderkey"))
    })
  )
}
