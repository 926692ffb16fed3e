package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming capability over the `events` table shape (SURVEY.md §2.11 —
  * additive per the north star; the reference is scheduled batch only).
  *
  * Every transform is written against an untyped DataFrame so the SAME
  * function runs in both batch and Structured Streaming: the declared
  * harness queries apply them to the batch events table (giving the
  * DuckDB oracle something to check), and EventStreamsSpec replays the
  * identical transforms through MemoryStream with watermarks, asserting
  * the streaming results converge to the batch answers — the unified-API
  * property Spark promises when aggregations are watermark-complete.
  *
  * Scale notes: windowed aggregations shuffle once on (window, key);
  * state stores grow with open windows only, and the watermark bounds
  * them. Session windows use Spark's native `session_window` (merging
  * state per key); the custom sessionizer below shows the
  * flatMapGroupsWithState path for logic session_window can't express.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event_type (6-hour buckets). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Sliding-window counts per event_type: 12-hour window, 3-hour slide —
    * each event lands in 4 overlapping windows.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "12 hours", "3 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))

  /** Session windows per user with a 6-hour inactivity gap — Spark's
    * native merging session_window.
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("total"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"), col("total"))

  /** Exactly-once-per-key dedup: first event per (user_id, event_type).
    * Batch form; under readStream the same call keeps ONE state entry
    * per distinct key for the stream's whole life — Spark only
    * watermark-evicts dropDuplicates state when the event-time column
    * is among the dedup keys, and here it deliberately is not (a key's
    * first event is first forever). For watermark-BOUNDED streaming
    * state use `dropDuplicatesWithinWatermark` (dedup only within the
    * lateness horizon) and accept re-emission of keys that go quiet
    * longer than the watermark — the standard trade at unbounded key
    * cardinality.
    */
  def firstPerUserType(events: DataFrame): DataFrame =
    events
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))

  /** Stream-stream interval join: each right event matched to same-user
    * left events within the preceding `window` (e.g. errors to the clicks
    * that led up to them). Right columns come back `r_`-prefixed. In
    * streaming, put a watermark on BOTH inputs first — the range
    * condition then bounds both state stores (Spark evicts rows once the
    * watermark passes the interval). Scale shape: an equi-join on
    * user_id with the range as a post-filter — a hash join at any size,
    * never a nested loop.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, window: String): DataFrame = {
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    left.join(r, col("user_id") === col("r_user_id")
      && col("ts") <= col("r_ts")
      && col("ts") >= col("r_ts") - expr(s"INTERVAL $window"))
  }

  /** Batch interval join with a coarse time-bucket riding the equi-key:
    * answer-identical to [[intervalJoin]] when the bucket width equals
    * the interval (a right row at bucket b matches only left rows in
    * buckets {b−1, b}, so replicating each LEFT row to {its bucket,
    * its bucket+1} covers every candidate exactly once — never twice,
    * because exactly one replica's bucket equals the right row's).
    *
    * Why it exists (r14 skew rehearsal, measured): a plain equi-join on
    * user_id makes per-key work QUADRATIC in the key's row count — one
    * hot user owning 5% of a 10M-event corpus put ~10¹⁰ pair
    * evaluations into a single SMJ task (q64 alone outweighed the rest
    * of the sweep). With the bucket in the join key the same hot user's
    * work spreads over its (user, hour) groups: bounded per task,
    * parallel across the timeline, and AQE-splittable. The range
    * predicate still applies post-join, so results are row-identical —
    * the oracle stays the plain declarative join.
    *
    * Bucketing uses FLOOR division (`(x - pmod(x, W)) div W`), not
    * Spark's truncate-toward-zero `div`: a pre-1970 timestamp at
    * ts_us = −1 must land in bucket −1, not 0, or its matches would be
    * silently dropped. With floor semantics the row-identity proof
    * above holds for ALL epochs, negative included (pinned in
    * EventStreamsSpec).
    */
  def intervalJoinBucketed(left: DataFrame, right: DataFrame, windowUs: Long): DataFrame = {
    def bucket(tsCol: String): org.apache.spark.sql.Column = {
      val u = s"unix_micros(cast($tsCol as timestamp))"
      expr(s"($u - pmod($u, $windowUs)) div $windowUs")
    }
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
      .withColumn("r_bk", bucket("r_ts"))
    val l = left
      .withColumn("l_b0", bucket("ts"))
      .withColumn("l_bk", explode(array(col("l_b0"), col("l_b0") + 1)))
      .drop("l_b0")
    l.join(r, col("user_id") === col("r_user_id")
        && col("l_bk") === col("r_bk")
        && col("ts") <= col("r_ts")
        && col("ts") >= col("r_ts") - expr(s"INTERVAL $windowUs MICROSECOND"))
      .drop("l_bk", "r_bk")
  }

  /** Stream-static enrichment: the events stream joined to a broadcast
    * customer dimension — THE most common production streaming shape
    * (enrich-then-aggregate). The static side is planned as a broadcast
    * per micro-batch, so the stream never shuffles for the join; the
    * same transform runs identically in batch (q65's oracle) and under
    * readStream (EventStreamsSpec replays it through MemoryStream).
    */
  def enrichedSegmentRollup(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))

  /** Deterministic late-data replay model + Spark's watermark-drop rule
    * as a BATCH classification (VERDICT r13 #4): the contract for what
    * `withWatermark("ts", "30 minutes")` + a 6-hour tumbling aggregate
    * DROPS when this corpus is replayed in arrival order.
    *
    * Arrival model (pure function of the row, so both engines and the
    * streaming replay agree): each event arrives `jit_ms` after its
    * event time — 1 in 20 events straggles up to 24 h (the realistic
    * heavy tail that actually exercises the drop path), the rest ≤ 10
    * min. Micro-batches are 6-hour buckets of ARRIVAL time, fed in
    * order. Spark's watermark before batch k is then
    * `max over batches ≤ k−lag of (max event ts, floored to ms) − 30 min`
    * (the floor mirrors EventTimeStats' microsecond→millisecond
    * truncation), and a row is dropped iff its 6-hour window END ≤ that
    * watermark — the eviction predicate streaming aggregation applies.
    *
    * `lag` names a REAL pacing dependence, measured not assumed: when
    * each bucket is fed and fully processed before the next arrives
    * (the LateDataSpec MemoryStream replay — an idle no-data batch
    * absorbs the watermark update between buckets), batch k drops
    * against stats through k−1 (`lag = 1`, the q108 oracle's model).
    * When buckets replay back-to-back from files (the chaos harness),
    * the update takes one extra batch to land in the offsets log and
    * batch k drops against stats through k−2 (`lag = 2`; measured
    * exactly — 23,335 of 38,648 model-late rows dropped at sf1, equal
    * to the lag-2 prediction, kill or no kill). Any real trajectory
    * sits between the two: ChaosRehearsal sandwiches the replay
    * per-window between the lag-1 and lag-2 aggregates.
    *
    * Scale shape: one groupBy over arrival buckets (tiny output — 4 per
    * day), a driver-scale running max, broadcast join back; no global
    * row ordering anywhere.
    */
  def lateClassified(events: DataFrame, lag: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = org.apache.spark.sql.graft.GraftExpressions.polyHash(
      concat(lit("late|"), col("event_id").cast("string")))
    // ts arrives TIMESTAMP_NTZ from the nanos-parquet conversion;
    // unix_micros needs TIMESTAMP and the session is pinned UTC, so the
    // cast is a pure reinterpretation (matches DuckDB's epoch_us over
    // the same naive timestamps).
    val rows = events
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("h", h)
      .withColumn("jit_ms", when(col("h") % 20 === 0, col("h") % 86400000L)
        .otherwise(col("h") % 600000L))
      .withColumn("arr_us", col("ts_us") + col("jit_ms") * 1000L)
      .withColumn("batch_id", expr("arr_us div 21600000000"))
      .withColumn("wend_us", (expr("ts_us div 21600000000") + lit(1L)) * 21600000000L)
    // Watermark per arrival batch: prior batches' max event time (ms
    // floor) − 30 min. The unpartitioned window is over ONE ROW PER
    // 6-HOUR BUCKET — ~1500 rows per corpus-year, driver-scale by
    // construction, then broadcast back to the events.
    val wm = rows.groupBy(col("batch_id"))
      .agg(max(expr("ts_us div 1000")).as("bmax_ms"))
      .withColumn("wm_us",
        (max(col("bmax_ms")).over(Window.orderBy(col("batch_id"))
          .rowsBetween(Window.unboundedPreceding, -lag)) - 1800000L) * 1000L)
      .select(col("batch_id"), col("wm_us"))
    rows.join(broadcast(wm), "batch_id")
      .withColumn("late", col("wm_us").isNotNull && col("wend_us") <= col("wm_us"))
  }

  // ── Custom stateful sessionization (flatMapGroupsWithState) ─────────

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, total: Double)

  /** BATCH-MODE flatMapGroupsWithState sessionizer with the same
    * 6-hour-gap semantics as [[sessions]] — the template for per-group
    * logic the built-in can't express (e.g. value-dependent gaps). All
    * of a key's rows arrive in one call and every session emits
    * immediately; state and timeouts are deliberately unused
    * (NoTimeout), so running this under readStream would sessionize
    * each micro-batch independently — the incremental form with carried
    * state and watermark-timeout flushing is [[sessionizeStream]].
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 6 * 3600 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // Batch-mode usage: all rows for the key arrive at once, state
          // starts empty; sort and fold into gap-separated sessions.
          val sorted = rows.toVector.sortBy(_.ts.getTime)
          val sessions = sorted.foldLeft(List.empty[SessionState]) { (acc, e) =>
            val t = e.ts.getTime
            acc match {
              case head :: tail if t - head.last <= gapMs =>
                SessionState(head.start, t, head.n + 1, head.total + e.value) :: tail
              case _ =>
                SessionState(t, t, 1, e.value) :: acc
            }
          }
          sessions.reverseIterator.map(s =>
            SessionOut(userId, new java.sql.Timestamp(s.start), s.n, s.total))
      }
  }

  /** TRUE incremental sessionizer: per-key open-session state carried
    * across micro-batches, closed sessions emitted when a new event
    * breaks the gap, and the final open session flushed by
    * EventTimeTimeout once the watermark passes last + gap. This is the
    * production stateful-streaming shape: state is one small record per
    * active key, bounded by the watermark — it never grows with history.
    * Requires `withWatermark` upstream.
    */
  def sessionizeStream(events: Dataset[Event], gapMs: Long = 6 * 3600 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed last + gap: the open session is final.
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.start), s.n, s.total))
          } else {
            val sorted = rows.toVector.sortBy(_.ts.getTime)
            val closed = Vector.newBuilder[SessionState]
            var open = state.getOption
            // Rows MORE than a gap before the open session's start can't
            // extend it under batch semantics (the sorted fold would have
            // closed a session in between) — without this arm the merge
            // guard below is vacuously true for them (t - s.last is
            // negative) and min(start, t) would drag session_start
            // arbitrarily backward past the gap, fabricating one long
            // session where the batch oracle has two. They fold into
            // their OWN gap-chained late session (rows are sorted, so
            // the chain closes as soon as the timeline re-enters the
            // open session's reach). Late rows spread across DIFFERENT
            // micro-batches can still emit as separate sessions where
            // batch would merge them — the bounded-lateness
            // approximation every watermark operator makes.
            var lateOpen = Option.empty[SessionState]
            def flushLate(): Unit = { lateOpen.foreach(closed += _); lateOpen = None }
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t < s.start - gapMs =>
                  lateOpen = lateOpen match {
                    case Some(l) if t - l.last <= gapMs =>
                      Some(SessionState(l.start, math.max(l.last, t), l.n + 1, l.total + e.value))
                    case other =>
                      other.foreach(closed += _)
                      Some(SessionState(t, t, 1, e.value))
                  }
                case Some(s) if t - s.last <= gapMs =>
                  // Within a gap of the open session (possibly before its
                  // start — a mildly-late row the batch fold WOULD merge).
                  // Clamp so the session only ever extends: `last` must
                  // never move backward (that would re-open the gap and
                  // could push the timeout at/below the watermark).
                  // If the late chain reaches THIS bridging row (rows are
                  // sorted, so t ≥ chain.last), the batch fold would have
                  // merged chain + row + open into ONE session — merge
                  // here too instead of flushing the chain as its own
                  // session (within-batch bridge; flushing was a split
                  // the documented cross-batch-only approximation never
                  // licensed).
                  open = lateOpen match {
                    case Some(l) if t - l.last <= gapMs =>
                      lateOpen = None
                      Some(SessionState(math.min(l.start, math.min(s.start, t)),
                        math.max(s.last, t), s.n + l.n + 1, s.total + l.total + e.value))
                    case _ =>
                      flushLate()
                      Some(SessionState(math.min(s.start, t), math.max(s.last, t),
                        s.n + 1, s.total + e.value))
                  }
                case Some(s) =>
                  flushLate()
                  closed += s
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  flushLate()
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            flushLate()
            open.foreach { s =>
              state.update(s)
              // setTimeoutTimestamp throws if the timestamp is not
              // strictly above the current watermark.
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator.map(s =>
              SessionOut(userId, new java.sql.Timestamp(s.start), s.n, s.total))
          }
      }
  }
}
