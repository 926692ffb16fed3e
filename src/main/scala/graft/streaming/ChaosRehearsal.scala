package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming CHAOS rehearsal (VERDICT r11 #6): the RocksDB sessionizer
  * and the near-dup ingest state machine driven over a REAL file-backed
  * stream at rehearsal scale, with a mid-run `kill -9` of the whole JVM
  * between the `victim` and `resume` phases. The restart specs prove the
  * semantics at fixture scale inside one JVM; this main proves them
  * across a hard process death at sf1+ — checkpoint offsets, RocksDB
  * state, and SegmentStore segments all rehydrated by a NEW process.
  *
  * Phases (driven by tools/chaos.sh; each phase is its own JVM):
  *   prep   <sfDir> <workDir> — time-sorted event chunks (plus one
  *          far-future flush event so every real session can close) and
  *          doc_id-sorted odd-id document chunks under workDir, strictly
  *          increasing mtimes so FileStreamSource's mod-time ordering
  *          replays them in the intended order. Even-id docs are the
  *          fixed dedup corpus (read straight from sfDir at run time).
  *   victim <sfDir> <workDir> — run both streams to completion… unless
  *          killed first (the harness sends SIGKILL mid-batch). Output
  *          goes through exactly-once shapes only: per-batch overwrite
  *          parquet for sessions, SegmentStore idempotent commits for
  *          the deduper.
  *   resume <sfDir> <workDir> — same queries, same checkpoints, fresh
  *          JVM: runs to completion, then VALIDATES (exit 1 on any
  *          failure): session output == the batch sessionize kernel
  *          (set equality, no duplicates — exactly-once across the
  *          kill), deduper accepted set == an independent sequential
  *          re-run of the same per-file batches against fresh state,
  *          and the SegmentStore dir holds zero torn/tmp segments.
  */
object ChaosRehearsal {

  private val FlushUser = 999999999L
  private val EventChunks = 16
  private val DocChunks = 12
  private val Gap = 6 * 3600 * 1000L
  private val NdThreshold = 0.5

  private val eventSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val lateSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def main(args: Array[String]): Unit = {
    val Array(phase, sfDir, workDir) = args.take(3)
    // The victim publishes its own pid FIRST: the harness must kill THIS
    // JVM, not sbt's launcher (whose cmdline also carries the runMain
    // string — killing it by pattern leaves the app JVM running as an
    // orphan that races the resume phase over the state dir).
    if (phase == "victim")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(workDir, "victim.pid"),
        ProcessHandle.current().pid().toString)
    val spark = graft.Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    phase match {
      case "prep" => prep(spark, sfDir, workDir)
      case "victim" | "resume" => run(spark, sfDir, workDir, validate = phase == "resume")
      case other => sys.error(s"unknown phase $other")
    }
    spark.stop()
  }

  /** Write `df` as exactly one parquet file named `outFile`, stamping
    * `mtime` — FileStreamSource orders discovered files by modification
    * time, and the rehearsal's replay-order claims need that order
    * deterministic.
    */
  private def writeChunk(df: DataFrame, workDir: String, outFile: String, mtime: Long): Unit = {
    val tmp = s"$workDir/tmp_chunk"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file in $tmp"))
    val dst = java.nio.file.Paths.get(outFile)
    java.nio.file.Files.createDirectories(dst.getParent)
    java.nio.file.Files.move(part.toPath, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(outFile).setLastModified(mtime)
    graft.Fs.rmTree(new java.io.File(tmp))
  }

  private def prep(spark: SparkSession, sfDir: String, workDir: String): Unit = {
    graft.Fs.rmTree(new java.io.File(workDir))
    new java.io.File(workDir).mkdirs()
    val base = System.currentTimeMillis() - 3600 * 1000L
    // Events: global time order, then contiguous row ranges per chunk —
    // a chunk processed in mtime order never carries an event older
    // than the watermark the previous chunk advanced to.
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id").cast("long"),
        // Normalize NTZ parquet annotations to plain TIMESTAMP so the
        // streaming read schema and the Event encoder line up.
        col("ts").cast("timestamp").as("ts"), col("value").cast("double"))
    val n = ev.count()
    val sz = math.max(1L, (n + EventChunks - 1) / EventChunks)
    val ranked = ev.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("user_id"), col("value"))) - 1)
    ranked.persist()
    // unix_millis, not getTimestamp: Spark 4's java8 datetime API hands
    // back LocalDateTime in Row getters.
    val maxTsMs = ev.agg(max(unix_millis(col("ts")))).head().getLong(0)
    assert(maxTsMs > 0)
    (0 until EventChunks).foreach { k =>
      writeChunk(
        ranked.filter(col("rn") >= k * sz && col("rn") < (k + 1) * sz).drop("rn"),
        workDir, f"$workDir/events_src/chunk_$k%03d.parquet", base + k * 2000L)
    }
    ranked.unpersist()
    // Far-future flush: watermark sails past every real session's
    // last + gap, so append-mode emits them all before end of stream.
    val s2 = spark; import s2.implicits._
    val flushTs = new java.sql.Timestamp(maxTsMs + 10L * 24 * 3600 * 1000)
    writeChunk(
      Seq((FlushUser, flushTs, 0.0)).toDF("user_id", "ts", "value"),
      workDir, f"$workDir/events_src/chunk_$EventChunks%03d.parquet",
      base + EventChunks * 2000L)
    // Documents: odd ids stream in doc_id order; even ids are corpus.
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").cast("long"), col("text"))
    val dn = docs.count()
    val dsz = math.max(1L, (dn + DocChunks - 1) / DocChunks)
    val dRanked = docs.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - 1)
    dRanked.persist()
    (0 until DocChunks).foreach { k =>
      writeChunk(
        dRanked.filter(col("rn") >= k * dsz && col("rn") < (k + 1) * dsz).drop("rn"),
        workDir, f"$workDir/docs_src/chunk_$k%03d.parquet", base + k * 2000L)
    }
    dRanked.unpersist()
    // Late-replay stream (VERDICT r13 #4): the q108 arrival model — one
    // chunk per 6-hour ARRIVAL bucket, fed in bucket order, so the
    // watermark-drop classification lateClassified declares (and the
    // q108 oracle checks in DuckDB) is exactly what the streaming
    // tumbling aggregate must drop, kill -9 or not.
    val classified = EventStreams.lateClassified(
        graft.sources.Tables.events(spark, sfDir))
      .select(col("batch_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("value").cast("double"), col("late"))
    classified.persist()
    val lateBuckets = classified.select("batch_id").distinct()
      .orderBy("batch_id").collect().map(_.getLong(0))
    lateBuckets.zipWithIndex.foreach { case (b, k) =>
      writeChunk(
        classified.filter(col("batch_id") === b)
          .select(col("ts"), col("event_type"), col("value")),
        workDir, f"$workDir/late_src/chunk_$k%04d.parquet", base + k * 2000L)
    }
    val nLate = classified.filter(col("late")).count()
    classified.unpersist()
    writeChunk(
      Seq((flushTs, "flush", 0.0)).toDF("ts", "event_type", "value"),
      workDir, f"$workDir/late_src/chunk_${lateBuckets.length}%04d.parquet",
      base + lateBuckets.length * 2000L)
    println(s"""{"phase":"prep","events":$n,"event_chunks":${EventChunks + 1},"docs":$dn,"doc_chunks":$DocChunks,"late_buckets":${lateBuckets.length},"late_rows":$nLate}""")
  }

  private def corpusShingles(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0 && col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TF.shingles(col("toks"), 3).as("shingles"))
  }

  /** Cross-process high-water mark of the sessionizer's state store,
    * tracked through a [[org.apache.spark.sql.streaming
    * .StreamingQueryListener]] rather than `recentProgress` — Spark
    * truncates recentProgress to the last ~100 updates
    * (spark.sql.streaming.numRecentProgressUpdates), so on long streams
    * a post-hoc sample under-reads the true mid-stream peak (ADVICE r15
    * #2). Every onQueryProgress that raises the running max persists it
    * to `<workDir>/sess_peak.json` via tmp+atomic-rename, seeded from
    * any existing file — so the VICTIM's peak survives its own SIGKILL
    * and the resume leg's validation reads the combined run's true
    * high-water mark instead of accepting a vacuous zero (VERDICT r15
    * #4: the leg that streamed must prove `peak > 0` inside the
    * pass/fail set).
    */
  private final class StatePeakTracker(workDir: String)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    @volatile var sessId: java.util.UUID = null
    private val peakFile = java.nio.file.Paths.get(workDir, "sess_peak.json")
    private var peakRows = 0L
    private var bytesAtPeak = 0L
    locally { val (r, b) = StatePeakTracker.read(workDir); peakRows = r; bytesAtPeak = b }
    def snapshot: (Long, Long) = synchronized((peakRows, bytesAtPeak))
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
      if (e.progress.id == sessId) synchronized {
        val rows = e.progress.stateOperators.map(_.numRowsTotal).sum
        if (rows > peakRows) {
          peakRows = rows
          bytesAtPeak = e.progress.stateOperators.map(_.memoryUsedBytes).sum
          val tmp = java.nio.file.Paths.get(workDir, s"sess_peak.json.tmp")
          java.nio.file.Files.writeString(tmp,
            s"""{"peak_rows":$peakRows,"store_bytes":$bytesAtPeak}""")
          java.nio.file.Files.move(tmp, peakFile,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
  }
  private object StatePeakTracker {
    def read(workDir: String): (Long, Long) = {
      val f = java.nio.file.Paths.get(workDir, "sess_peak.json")
      if (!java.nio.file.Files.exists(f)) (0L, 0L)
      else {
        val s = java.nio.file.Files.readString(f)
        def field(k: String): Long =
          s.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
        (field("peak_rows"), field("store_bytes"))
      }
    }
  }

  /** Victim-side kill gate (VERDICT r16 #3 — de-vacuating the restart-
    * watermark sandwich). The divergence the re-derived contract bounds
    * only occurs when the SIGKILL lands in the gap between an
    * event-time-ADVANCING late batch's commit and the next batch's
    * offsets write (committed stats still in memory, not yet folded
    * into a persisted watermark) — r16's both re-runs landed elsewhere
    * and proved the ceiling vacuously (divergence 0). This listener
    * makes the timing targetable instead of lottery-drawn: once every
    * stream has real progress, each late-query progress whose
    * eventTime.max exceeds watermark+delay (i.e. the JUST-COMMITTED
    * batch's stats will advance the watermark, and a kill RIGHT NOW
    * loses them) touches `<workDir>/kill_now` — the progress event
    * posts immediately after the commit-log write, so a harness
    * polling the marker at sub-batch granularity kills inside the gap
    * with high probability. tools/chaos.sh retries the whole flow
    * until the resume leg reports divergence > 0, so the artifact's
    * sandwich is exercised, not assumed.
    */
  private final class KillGate(workDir: String, lateId: java.util.UUID,
      otherIds: Set[java.util.UUID], delayMs: Long)
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    private val counts = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()
    override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      counts.merge(p.id, 1L, (a, b) => a + b)
      val minProgress = counts.getOrDefault(lateId, 0L) >= 3 &&
        otherIds.forall(id => counts.getOrDefault(id, 0L) >= 3)
      if (p.id == lateId && minProgress) {
        val et = p.eventTime
        val mx = et.get("max"); val wm = et.get("watermark")
        if (mx != null && wm != null) {
          val advancing = java.time.Instant.parse(mx).toEpochMilli - delayMs >
            java.time.Instant.parse(wm).toEpochMilli
          if (advancing)
            try java.nio.file.Files.writeString(
              java.nio.file.Paths.get(workDir, "kill_now"),
              s"""{"batch":${p.batchId},"max":"$mx","watermark":"$wm"}""")
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }

  private def run(spark: SparkSession, sfDir: String, workDir: String,
      validate: Boolean): Unit = {
    import spark.implicits._
    val peakTracker = new StatePeakTracker(workDir)
    // ── Sessionizer stream: RocksDB flatMapGroupsWithState over the
    // event chunks, per-batch OVERWRITE parquet (idempotent on replay).
    val sessOut = s"$workDir/sess_out"
    val evStream = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$workDir/events_src")
      .withWatermark("ts", "1 minute")
      .as[EventStreams.Event]
    val sessQ = EventStreams.sessionizeStream(evStream, Gap)
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt_sess")
      .outputMode("append")
      .foreachBatch { (out: Dataset[EventStreams.SessionOut], batchId: Long) =>
        out.write.mode("overwrite").parquet(f"$sessOut/batch_$batchId%05d")
      }
      .start()
    // sessId BEFORE addListener (ADVICE r16 #3): the old order
    // registered the listener first and assigned the id after start(),
    // so progress events delivered in that window were dropped against
    // a null filter — benign only because onQueryProgress fires after a
    // completed micro-batch. This order removes the timing dependence:
    // no event can reach the listener before the id it filters on is
    // set.
    peakTracker.sessId = sessQ.id
    spark.streams.addListener(peakTracker)
    // ── Near-dup ingest stream: SegmentStore-backed deduper, one doc
    // chunk per micro-batch; apply(batch, batchId) is idempotent.
    val deduper = new NearDupIngestDeduper(
      corpusShingles(spark, sfDir), NdThreshold,
      statePath = Some(s"$workDir/nd_state"))
    val ndQ = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$workDir/docs_src")
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt_nd")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deduper(batch, batchId).count(); ()
      }
      .start()
    // ── Late-replay stream: q108's arrival model (one 6-hour arrival
    // bucket per micro-batch), 30-minute watermark, 6-hour tumbling
    // aggregate in append mode. Dropped-late rows must STAY dropped
    // across the kill: the recovered watermark comes from the commit
    // log, so a replayed batch re-drops exactly what the classification
    // says — validated against the batch on-time aggregate below.
    val lateOut = s"$workDir/late_out"
    val lateQ = EventStreams.tumbling(
        spark.readStream.schema(lateSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$workDir/late_src")
          .withWatermark("ts", "30 minutes"))
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt_late")
      .outputMode("append")
      .foreachBatch { (out: DataFrame, batchId: Long) =>
        out.write.mode("overwrite").parquet(f"$lateOut/batch_$batchId%05d")
      }
      .start()
    // The kill gate only arms the VICTIM leg: the resume/validate leg
    // must run to completion, and a marker there would just confuse the
    // harness's polling.
    if (!validate)
      spark.streams.addListener(new KillGate(workDir, lateQ.id,
        Set(sessQ.id, ndQ.id), delayMs = 30L * 60 * 1000))
    sessQ.processAllAvailable(); sessQ.stop()
    ndQ.processAllAvailable(); ndQ.stop()
    lateQ.processAllAvailable(); lateQ.stop()
    // The sessionizer's state-store SIZE (VERDICT r14 #5): per-key
    // state is one fixed-size SessionState regardless of the key's
    // event count — the claim that makes a 5%-of-the-stream hot user
    // safe is that state rows scale with USERS, not events. PEAK, not
    // final: the stream's closing flush times every session out, so the
    // last progress always reads zero rows — the shape that matters is
    // the high-water mark of live per-key state mid-stream, tracked by
    // [[StatePeakTracker]] across EVERY progress update (not the
    // truncated recentProgress window) and persisted so it survives the
    // victim's SIGKILL. memoryUsedBytes is the provider's STORE-level
    // estimate (RocksDB memtables + cache, dominated by fixed
    // per-partition overhead) — reported as store_bytes; the per-key
    // payload is structural: one fixed-width SessionState (4 fields,
    // ~32 B encoded) per active key, independent of the key's event
    // count; validate() bounds both below.
    spark.streams.removeListener(peakTracker)
    val sessState = peakTracker.snapshot
    println(s"""{"session_state":{"peak_rows":${sessState._1},"store_bytes":${sessState._2}}}""")
    if (!validate) {
      // The victim is not supposed to get here — the harness's kill
      // should land first. Record that it survived so the script can
      // retry with an earlier kill instead of "passing" vacuously.
      println(s"""{"phase":"victim","survived":true}""")
      return
    }

    var failures = 0
    def check(name: String, ok: Boolean, detail: String = ""): Unit = {
      println(s"""{"check":"$name","ok":$ok${if (detail.nonEmpty) s""","detail":"$detail"""" else ""}}""")
      if (!ok) failures += 1
    }

    // 1. Exactly-once sessions across the kill: streaming output (all
    // batches, replay overwrites included) == the BATCH sessionize
    // kernel over the same events, as a set, with no duplicates.
    val got = spark.read.schema(StructType(Seq(
        StructField("user_id", LongType), StructField("session_start", TimestampType),
        StructField("n_events", LongType), StructField("total", DoubleType))))
      .parquet(s"$sessOut/batch_*")
      .filter(col("user_id") =!= FlushUser)
    val gotRows = got.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSeq
    val expect = EventStreams.sessionize(
        graft.sources.Tables.events(spark, sfDir)
          .select(col("user_id").cast("long"),
            col("ts").cast("timestamp").as("ts"), col("value").cast("double"))
          .as[EventStreams.Event], Gap)
      .collect().map(o => (o.user_id, o.session_start, o.n_events, o.total)).toSeq
    check("sessions_no_duplicates", gotRows.size == gotRows.distinct.size,
      s"rows=${gotRows.size} distinct=${gotRows.distinct.size}")
    check("sessions_match_batch_kernel", gotRows.toSet == expect.toSet,
      s"stream=${gotRows.size} batch=${expect.size} " +
        s"onlyStream=${(gotRows.toSet -- expect.toSet).size} onlyBatch=${(expect.toSet -- gotRows.toSet).size}")

    // 1b. The hot-user state shape, sized (VERDICT r14 #5): PEAK state
    // rows must be bounded by DISTINCT USERS (+1 for the flush key),
    // never by event count — a user owning 5% of the stream holds
    // exactly one SessionState row at any instant, so the hot key
    // pressures the GROUPING (bounded per micro-batch), not the store.
    // sessState is the CROSS-PROCESS high-water mark ([[
    // StatePeakTracker]] persists it through the victim's SIGKILL), so
    // a zero here means no leg ever held live state — the sizing claim
    // would be unproven. VERDICT r15 #4: peak > 0 is a REQUIRED member
    // of the pass/fail set, not a side-field.
    val userCount = graft.sources.Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    check("state_peak_rows_nonvacuous", sessState._1 > 0,
      s"peak_state_rows=${sessState._1} (combined victim+resume high-water mark)")
    check("state_peak_rows_bounded_by_users", sessState._1 <= userCount + 1,
      s"peak_state_rows=${sessState._1} users=$userCount store_bytes=${sessState._2}")
    // Per-key payload envelope: the store-level byte estimate at the
    // peak must fit fixed per-partition RocksDB overhead (memtables,
    // block cache — ~8 MB/partition observed ceiling) plus a generous
    // fixed width per live key (2 KB/row vs the ~32 B structural
    // payload + RocksDB index/bloom amplification; skewed sf10 measured
    // 703 B/row inclusive of overhead). A per-key payload that GREW
    // with a key's event count would burst this envelope at the hot
    // user long before users*2KB.
    val statePartitions = spark.conf.get("spark.sql.shuffle.partitions").toLong
    val envelope = 8L * 1024 * 1024 * statePartitions + 2048L * sessState._1
    check("state_store_bytes_within_envelope", sessState._2 <= envelope,
      s"store_bytes=${sessState._2} envelope=$envelope " +
        s"(8MB x $statePartitions partitions + 2KB x ${sessState._1} rows)")
    gotRows.groupBy(_._1).view.mapValues(ss => (ss.size, ss.map(_._3).sum)).toSeq
      .sortBy(-_._2._2).headOption.foreach { case (u, (nSess, nEv)) =>
        println(s"""{"hot_user":{"user_id":$u,"sessions":$nSess,"events":$nEv""" +
          s""","share":${"%.4f".format(nEv.toDouble / gotRows.map(_._3).sum)}""" +
          s""","peak_state_rows":${sessState._1},"store_bytes":${sessState._2}}}""")
      }

    // 2. Deduper state vs an INDEPENDENT sequential re-run: same chunk
    // files, same per-file batch ids, fresh in-memory state. Batch
    // boundaries are deterministic (one file per trigger, mtime order),
    // so the accepted sets must agree exactly across the kill.
    val accepted = acceptedIds(spark, deduper)
    val ref = new NearDupIngestDeduper(corpusShingles(spark, sfDir), NdThreshold)
    val chunkFiles = new java.io.File(s"$workDir/docs_src").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    chunkFiles.zipWithIndex.foreach { case (f, i) =>
      ref(spark.read.schema(docSchema).parquet(f.toString), i.toLong).count()
    }
    val refAccepted = acceptedIds(spark, ref)
    check("neardup_accepted_matches_sequential_rerun", accepted == refAccepted,
      s"stream=${accepted.size} ref=${refAccepted.size} " +
        s"onlyStream=${(accepted -- refAccepted).size} onlyRef=${(refAccepted -- accepted).size}")
    ref.close()
    deduper.close()

    // 3. Late-row accounting across the kill (VERDICT r13 #4; contract
    // RE-DERIVED in r16 after this rehearsal's whole-JVM-kill arm
    // caught the restart watermark regression). Spark restores the
    // watermark from the OFFSETS LOG on restart, and the in-flight
    // batch's EventTimeStats die with the JVM — so the first
    // post-restart batch legitimately drops against event-time stats
    // one step OLDER than an uninterrupted replay would (admitting a
    // few extra late rows near the kill point; measured at skew sf1:
    // +222 rows over 10 windows). The r13-r15 checks demanded strict
    // kill-invariance plus a lag-1..lag-2 sandwich — one lag step too
    // tight for a kill that lands on a watermark-advancing boundary
    // (they stayed green for two rounds because earlier kills landed on
    // non-advancing boundaries, and the executor-loss flow never
    // restarts the driver). The honest post-kill contract, in three
    // parts: (a) ADMISSION-ONLY DIVERGENCE — versus a clean from-
    // scratch replay in THIS process, the killed+recovered run may
    // only ever ADMIT extra rows, never lose any: a window count below
    // the clean replay's would mean a row dropped by the kill itself
    // (an exactly-once violation), and a dropped-late row that
    // REAPPEARED would duplicate a window (check 'no_duplicate_
    // windows'). (b) KILLED SANDWICH — every window of the killed run
    // sits within [lag-1, lag-3]: the back-to-back file trajectory is
    // lag-2 (measured, see lateClassified's scaladoc) and ONE restart
    // adds at most ONE further step (exactly the one batch whose stats
    // were lost). (c) CLEAN-REPLAY SANDWICH — the un-killed replay
    // stays within the original [lag-1, lag-2], pinning that the
    // widened ceiling is restart-specific, not model drift. The strict
    // divergence size is still REPORTED (late_restart_divergence) so
    // the artifact shows exactly how much the restart admitted.
    def readWindows(dir: String): Seq[(String, String, Long, Double)] =
      spark.read.schema(StructType(Seq(
          StructField("window_start", StringType), StructField("event_type", StringType),
          StructField("n", LongType), StructField("total", DoubleType))))
        .parquet(dir)
        .filter(col("event_type") =!= "flush")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val lateGot = readWindows(s"$workDir/late_out/batch_*")
    check("late_stream_no_duplicate_windows", lateGot.size == lateGot.distinct.size,
      s"rows=${lateGot.size} distinct=${lateGot.distinct.size}")

    val refQ = EventStreams.tumbling(
        spark.readStream.schema(lateSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$workDir/late_src")
          .withWatermark("ts", "30 minutes"))
      .writeStream
      .option("checkpointLocation", s"$workDir/ckpt_late_ref")
      .outputMode("append")
      .foreachBatch { (out: DataFrame, batchId: Long) =>
        out.write.mode("overwrite").parquet(f"$workDir/late_out_ref/batch_$batchId%05d")
      }
      .start()
    refQ.processAllAvailable(); refQ.stop()
    val lateRef = readWindows(s"$workDir/late_out_ref/batch_*")

    def modelAgg(lag: Int): Map[(String, String), Long] = {
      val classified = EventStreams.lateClassified(
          graft.sources.Tables.events(spark, sfDir), lag)
        .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
          col("value").cast("double").as("value"), col("late"))
      EventStreams.tumbling(classified.filter(!col("late")))
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    }
    val lag1 = modelAgg(1)
    val lag2 = modelAgg(2)
    val lag3 = modelAgg(3)
    val gotN = lateGot.map(t => ((t._1, t._2), t._3)).toMap
    val refN = lateRef.map(t => ((t._1, t._2), t._3)).toMap
    val keys = lag1.keySet ++ lag2.keySet ++ lag3.keySet ++ gotN.keySet ++ refN.keySet

    // (a) admission-only divergence vs the clean replay.
    val regressed = keys.toSeq.filter(k => gotN.getOrElse(k, 0L) < refN.getOrElse(k, 0L))
    val surplus = keys.toSeq.map(k => gotN.getOrElse(k, 0L) - refN.getOrElse(k, 0L)).sum
    val diverged = keys.count(k => gotN.getOrElse(k, 0L) != refN.getOrElse(k, 0L))
    check("late_restart_admission_only", regressed.isEmpty,
      s"killed=${lateGot.size} unkilled=${lateRef.size} regressedWindows=" +
        s"${regressed.take(3).mkString(",")} (a window below the clean replay = a lost row)")
    println(s"""{"late_restart_divergence":{"windows":$diverged,"surplus_rows":$surplus}}""")

    // (b) killed run within [lag-1, lag-3] (one restart = at most one
    // extra lag step past the measured back-to-back lag-2 trajectory).
    val vKilled = keys.toSeq.filter { k =>
      val g = gotN.getOrElse(k, 0L)
      g < lag1.getOrElse(k, 0L) || g > lag3.getOrElse(k, 0L)
    }
    val gotSum = lateGot.map(_._3).sum
    val totalEvents = graft.sources.Tables.events(spark, sfDir).count()
    check("late_killed_sandwiched_lag1_lag3", vKilled.isEmpty,
      s"windows=${keys.size} violations=${vKilled.take(3).mkString(",")} " +
        s"sum lag1=${lag1.values.sum} got=$gotSum lag3=${lag3.values.sum}")

    // (c) the clean replay stays inside the ORIGINAL [lag-1, lag-2]
    // sandwich — the widened ceiling above is restart-specific.
    val vRef = keys.toSeq.filter { k =>
      val g = refN.getOrElse(k, 0L)
      g < lag1.getOrElse(k, 0L) || g > lag2.getOrElse(k, 0L)
    }
    check("late_unkilled_replay_sandwiched_lag1_lag2", vRef.isEmpty,
      s"windows=${keys.size} violations=${vRef.take(3).mkString(",")} " +
        s"sum lag1=${lag1.values.sum} ref=${lateRef.map(_._3).sum} lag2=${lag2.values.sum}")
    // Non-vacuous: the replay really dropped rows (admitted < corpus)
    // and the model really classified rows late (lag-1 on-time < corpus).
    check("late_fixture_nonvacuous",
      gotSum < totalEvents && lag1.values.sum < totalEvents,
      s"got=$gotSum lag1=${lag1.values.sum} corpus=$totalEvents")

    // 4. SegmentStore hygiene after the kill + rehydration: no orphaned
    // tmp dirs, no marker-less (torn) segment dirs left on disk.
    val state = new java.io.File(s"$workDir/nd_state").listFiles().toSeq
    val torn = state.filter(f => f.isDirectory &&
      !new java.io.File(f, "_graft_commit").exists())
    check("segment_store_zero_torn_or_tmp", torn.isEmpty,
      torn.map(_.getName).mkString(","))
    println(s"""{"phase":"resume","failures":$failures,"accepted":${accepted.size},"sessions":${gotRows.size},"late_windows":${lateGot.size},"late_rows_dropped":${totalEvents - gotSum},"late_model_lag1_drops":${totalEvents - lag1.values.sum},"late_model_lag2_drops":${totalEvents - lag2.values.sum}}""")
    if (failures > 0) { spark.stop(); sys.exit(1) }
  }

  /** Distinct accepted doc ids across every committed state segment
    * (the store's marker gate is the commit contract, so a torn write
    * can never count as accepted).
    */
  private def acceptedIds(spark: SparkSession, d: NearDupIngestDeduper): Set[Long] = {
    val dirs = new java.io.File(d.store.stateDir).listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "_graft_commit").exists())
      .map(f => new java.io.File(f, "sh").toString)
    if (dirs.isEmpty) Set.empty
    else spark.read.schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("shingles", ArrayType(StringType)))))
      .parquet(dirs.toIndexedSeq: _*)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
  }
}
