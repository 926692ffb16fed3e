package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables.events
import graft.streaming.EventStreams

/** Streaming-analogue suite (SURVEY.md §2.11, §7 phase 4): the identical
  * transform functions run here in batch over the events table so DuckDB
  * can verify the aggregation logic; EventStreamsSpec replays them through
  * MemoryStream with watermarks and asserts convergence to these answers.
  */
object Streaming {

  val all: Seq[QueryDef] = Seq(

    // ── Tumbling event-time windows (6 h) per event_type.
    QueryDef(
      "q60_tumbling_window",
      Some("""
        SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n, round(sum(value), 6) AS total
        FROM events
        GROUP BY 1, 2 ORDER BY window_start, event_type"""))( (spark, dir) =>
      EventStreams.tumbling(events(spark, dir))
        .orderBy(col("window_start"), col("event_type"))),

    // ── Sliding windows (12 h window, 3 h slide): each event in 4
    // overlapping buckets; oracle unrolls the slide offsets.
    QueryDef(
      "q61_sliding_window",
      Some("""
        SELECT strftime(time_bucket(INTERVAL '3 hours', ts) - k * INTERVAL '3 hours',
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, count(*) AS n
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
        GROUP BY 1, 2 ORDER BY window_start, event_type"""))( (spark, dir) =>
      EventStreams.sliding(events(spark, dir))
        .orderBy(col("window_start"), col("event_type"))),

    // ── Merging session windows per user, 6 h inactivity gap; oracle is
    // the classic gaps-and-islands rewrite.
    QueryDef(
      "q62_session_window",
      Some("""
        WITH o AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL '6 hours' THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
        SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               count(*) AS n_events, round(sum(value), 6) AS total
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start"""))( (spark, dir) =>
      EventStreams.sessions(events(spark, dir))
        .orderBy(col("user_id"), col("session_start"))),

    // ── Stream-stream interval join analogue (errors ← same-user clicks
    // within the preceding hour): the identical intervalJoin transform
    // EventStreamsSpec replays through two MemoryStreams with watermarks.
    QueryDef(
      "q64_interval_join",
      Some("""
        SELECT c.event_id AS click_id, e.event_id AS error_id
        FROM events c JOIN events e
          ON c.user_id = e.user_id
         AND c.event_type = 'click' AND e.event_type = 'error'
         AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL '1 hour'
        ORDER BY click_id, error_id"""))( (spark, dir) => {
      val ev = events(spark, dir)
      // Bucketed form (r14): hour rides the equi-key so a hot user's
      // per-key work is bounded per (user, hour) instead of quadratic
      // in the user's total rows — row-identical to the plain join the
      // oracle declares (see intervalJoinBucketed's scaladoc; the
      // streaming replay keeps intervalJoin, where the watermark bounds
      // state instead).
      EventStreams.intervalJoinBucketed(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"), 3600L * 1000000L)
        .select(col("event_id").as("click_id"), col("r_event_id").as("error_id"))
        .orderBy(col("click_id"), col("error_id"))
    }),

    // ── Streaming-dedup analogue: first event per (user_id, event_type);
    // output counts only, so the surviving-row nondeterminism of
    // dropDuplicates never reaches the hash.
    QueryDef(
      "q63_dedup_first",
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type"""))( (spark, dir) =>
      EventStreams.firstPerUserType(events(spark, dir))
        .orderBy(col("event_type"))),

    // ── Stream-static enrichment join: events against the broadcast
    // customer dimension, rolled up per market segment — the canonical
    // enrich-then-aggregate production stream. Identical transform
    // replayed through MemoryStream in EventStreamsSpec; the stream side
    // never shuffles for the join (broadcast per micro-batch).
    // ── Watermark late-drop contract (VERDICT r13 #4): the on-time/late
    // classification of this corpus under a deterministic arrival replay
    // (heavy-tail stragglers, 6 h arrival batches, 30 min watermark,
    // 6 h tumbling windows) as a batch query both engines can compute.
    // The oracle mirrors Spark's watermark mechanics operation-for-
    // operation: ms-floored max event time per arrival batch, running
    // max over PRIOR batches, window-END ≤ watermark drops. LateDataSpec
    // proves real Structured Streaming drops exactly this set under
    // per-bucket pacing (each batch fully processed before the next
    // arrives — the lag-1 trajectory; a back-to-back file replay lags
    // one batch more, see lateClassified's scaladoc); the chaos harness
    // proves kill-invariance and sandwiches the replay between the
    // lag-1/lag-2 models.
    QueryDef(
      "q108_late_watermark",
      Some(s"""
        WITH e AS (
          SELECT event_type, value, epoch_us(ts) AS ts_us,
                 ${graft.functions.TextSql.stringHashExpr(
                   "'late|' || event_id::VARCHAR")} AS h
          FROM events),
        j AS (
          SELECT event_type, value, ts_us,
                 ts_us + (CASE WHEN h % 20 = 0 THEN h % 86400000
                               ELSE h % 600000 END) * 1000 AS arr_us
          FROM e),
        b AS (SELECT *, arr_us // 21600000000 AS batch_id FROM j),
        bm AS (SELECT batch_id, max(ts_us // 1000) AS bmax_ms FROM b GROUP BY 1),
        wm AS (
          SELECT batch_id,
                 (max(bmax_ms) OVER (ORDER BY batch_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  - 1800000) * 1000 AS wm_us
          FROM bm),
        c AS (
          SELECT b.event_type, b.value,
                 CASE WHEN wm.wm_us IS NOT NULL
                       AND ((b.ts_us // 21600000000) + 1) * 21600000000 <= wm.wm_us
                      THEN 1 ELSE 0 END AS late
          FROM b JOIN wm USING (batch_id))
        SELECT event_type,
               sum(late)::BIGINT AS n_late,
               sum(1 - late)::BIGINT AS n_ontime,
               round(sum(CASE WHEN late = 0 THEN value ELSE 0 END), 6) AS ontime_total
        FROM c GROUP BY 1 ORDER BY event_type"""))( (spark, dir) =>
      EventStreams.lateClassified(events(spark, dir))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          sum(when(col("late"), 0L).otherwise(1L)).as("n_ontime"),
          round(sum(when(col("late"), 0.0).otherwise(col("value"))), 6).as("ontime_total"))
        .orderBy(col("event_type"))),

    QueryDef(
      "q65_stream_static",
      Some("""
        SELECT c_mktsegment, count(*) AS n, round(sum(value), 6) AS total
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY c_mktsegment"""))( (spark, dir) =>
      EventStreams.enrichedSegmentRollup(
          events(spark, dir), graft.sources.Tables.customer(spark, dir))
        .orderBy(col("c_mktsegment")))
  )
}
