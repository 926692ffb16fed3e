package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming ingest dedup: the continuous form of the q57 incremental
  * pattern. Each micro-batch of (doc_id, digest) keeps only rows whose
  * digest is in neither the persistent corpus nor any earlier accepted
  * micro-batch, dedup'd within the batch (min doc_id per digest wins).
  * Rows with a null digest are dropped explicitly up front (an
  * undigestable row has no dedup identity; silently three-valued
  * filtering would lose them without a trace).
  *
  * Flow per batch — q57's two-scan shape, plus TABLE-BACKED state:
  *   1. scan 1: the native [[org.apache.spark.sql.graft.BloomMightContain]]
  *      probe projects the maybe-in-CORPUS set (tiny: true dups + fpp
  *      tail);
  *   2. `present` = (corpus ∩ maybe) via a map-side semi join against
  *      the broadcast maybe-set (the corpus is scanned, never shuffled),
  *      unioned with (accepted-table ∩ batch-digests) — one more
  *      map-side semi join, against the broadcast within-batch digest
  *      set. Both sides are scanned, pruned map-side, never shuffled.
  *   3. scan 2: ONE anti join of the batch against broadcast(present).
  *      No maybe/definite union: the bloom has no false negatives over
  *      the corpus and the batch digest set trivially covers the batch,
  *      so present ⊇ batch ∩ (corpus ∪ accepted) and the anti join is
  *      exact for any fpp.
  *   4. the batch's accepted rows are WRITTEN to the state table (one
  *      directory per batch under `statePath`), and the returned
  *      relation is a leaf read of exactly that directory — rows never
  *      round-trip through the driver.
  *
  * State sizing: driver state is the corpus bloom (fixed size) plus one
  * path string per batch — NO per-digest driver structure, no collect
  * anywhere in the batch path. Accepted digests deliberately never
  * enter the bloom: folding them in (the "rebuild periodically"
  * pattern) would make the filter's fpp degrade as ingest outpaces its
  * capacity, needing a rebuild cadence to tune — while buying nothing,
  * because exact rejection against accepted history needs the
  * accepted-table semi join anyway and that join is already pruned
  * map-side by the broadcast batch digest set (a micro-batch, so the
  * broadcast is small by construction). With a corpus-only bloom the
  * fpp is fixed at construction and there is no saturation cliff at
  * all. The per-batch cost that DOES grow with stream life is the
  * accepted-table scan (a columnar single-column scan, pruned by
  * min/max + dictionary against the broadcast digests); a long-lived
  * deployment bounds it by compacting the per-batch directories and
  * periodically folding the accepted table into the corpus snapshot —
  * a table-maintenance job, not a correctness dependency.
  *
  * Retries: `apply(batch, batchId)` (the foreachBatch signature) is
  * idempotent — re-running a batchId overwrites that batch's state
  * directory and excludes it from the prior-accepted relation, so a
  * foreachBatch retry after a partial failure reproduces the same
  * output instead of self-rejecting. The 1-arg `apply` auto-increments.
  *
  * Thread-safe for Structured Streaming's sequential foreachBatch
  * contract (one batch at a time; synchronized defensively).
  */
final class IngestDeduper(
    corpusDigests: DataFrame, expectedItems: Long, fpp: Double = 0.01,
    statePath: Option[String] = None)
    extends Serializable {

  private val spark = corpusDigests.sparkSession

  private val corpus = corpusDigests.select(col("digest")).persist()
  private val bloom = corpus.stat.bloomFilter("digest", math.max(expectedItems, 1L), fpp)

  private val stateSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("digest", StringType)))

  /** One directory per batch; created lazily, removed in [[close]] only
    * when this deduper created it (a caller-provided path is theirs).
    */
  private val selfOwnedState = statePath.isEmpty
  private val stateDir: String = statePath.getOrElse(
    java.nio.file.Files.createTempDirectory("ingest-dedup-state-").toString)

  /** batchId → state directory. The ONLY per-batch driver state: one
    * path string each (the accepted digests themselves live in the
    * table). REHYDRATED from the on-disk layout when a caller-provided
    * statePath already holds committed batches — a restarted stream
    * (driver crash, redeploy) must keep rejecting everything accepted
    * before the restart, which is the point of table-backed state.
    */
  private val batchDirs: scala.collection.mutable.SortedMap[Long, String] = {
    val m = scala.collection.mutable.SortedMap.empty[Long, String]
    val kids = new java.io.File(stateDir).listFiles()
    if (kids != null) kids.foreach { f =>
      val n = f.getName
      if (f.isDirectory && n.startsWith("b") && n.drop(1).forall(_.isDigit) &&
          new java.io.File(f, "_SUCCESS").exists())
        m(n.drop(1).toLong) = f.toString
    }
    m
  }

  /** Accepted rows of this batch: (doc_id, digest), new against corpus,
    * prior batches, and itself. The returned relation is a leaf over the
    * just-written state directory — stable regardless of later batches.
    */
  def apply(batch: DataFrame): DataFrame = synchronized {
    runBatch(batch, if (batchDirs.isEmpty) 0L else batchDirs.lastKey + 1L)
  }

  /** foreachBatch-shaped entry point: idempotent per batchId (see class
    * notes on retries).
    */
  def apply(batch: DataFrame, batchId: Long): DataFrame = synchronized {
    runBatch(batch, batchId)
  }

  private def runBatch(batch: DataFrame, batchId: Long): DataFrame = {
    val dir = s"$stateDir/b$batchId"
    val tmp = s"$dir.tmp"
    // A retry of the same batchId must not see its own earlier attempt —
    // but the committed state stays intact until the replacement commits
    // (write to .tmp, swap on success): a retry that fails mid-write
    // must not have destroyed the digests the first attempt accepted.
    val priorDirs = (batchDirs - batchId).values.toSeq
    val b = batch.filter(col("digest").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("digest").cast("string").as("digest"))
      .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("digest"))
      .persist() // scanned thrice: maybe-set, batch-digest set, anti join
    // try/finally: a failed micro-batch (executor loss, fetch failure)
    // retries through foreachBatch — without the finally each attempt
    // would leak one persisted batch relation for the stream's life.
    try {
      val maybeDigests = b
        .filter(org.apache.spark.sql.graft.BloomMightContain.column(col("digest"), bloom))
        .select(col("digest")).distinct()
      val batchDigests = b.select(col("digest"))
      val acceptedPrior =
        if (priorDirs.isEmpty) spark.createDataFrame(spark.emptyDataFrame.rdd, stateSchema)
        else spark.read.schema(stateSchema).parquet(priorDirs: _*)
      val present = corpus
        .join(broadcast(maybeDigests), Seq("digest"), "left_semi")
        .unionByName(acceptedPrior.select(col("digest"))
          .join(broadcast(batchDigests), Seq("digest"), "left_semi"))
        .distinct()
      b.join(broadcast(present), Seq("digest"), "left_anti")
        .select(col("doc_id"), col("digest"))
        .write.mode("overwrite").parquet(tmp)
    } finally b.unpersist(blocking = false)
    // Commit: swap the completed write in (local-fs rename; a real
    // deployment would go through the FileSystem API / a committer).
    rmTree(new java.io.File(dir))
    if (!new java.io.File(tmp).renameTo(new java.io.File(dir)))
      throw new java.io.IOException(s"could not commit batch state $tmp -> $dir")
    batchDirs(batchId) = dir
    spark.read.schema(stateSchema).parquet(dir)
  }

  /** Driver-held per-batch bookkeeping size, for the bounded-state spec:
    * the number of retained path strings (there is no per-digest driver
    * structure to measure).
    */
  private[streaming] def retainedBatchCount: Int = synchronized(batchDirs.size)

  private def rmTree(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rmTree); f.delete(): Unit
  }

  /** The table-maintenance job the class notes promise: fold every
    * committed batch segment into ONE base segment (keyed by the highest
    * committed batchId), so the per-batch accepted-table scan stops
    * listing/opening one directory per batch on long-lived streams.
    * Contents are unchanged — later batches reject exactly as before.
    *
    * Call between batches (it shares the deduper's synchronized
    * contract). Retries of PRE-compaction batchIds stop being
    * idempotent afterwards — their rows are folded into the base
    * segment, which a same-id re-run would see as prior state — so
    * compact only past the stream's committed checkpoint, the same
    * rule any sink compaction obeys.
    */
  def compact(): Unit = synchronized {
    if (batchDirs.size > 1) {
      val tmp = s"$stateDir/compact.tmp"
      spark.read.schema(stateSchema).parquet(batchDirs.values.toSeq: _*)
        .write.mode("overwrite").parquet(tmp) // materializes before any delete
      val keep = batchDirs.lastKey
      val dir = s"$stateDir/b$keep"
      batchDirs.values.foreach(d => rmTree(new java.io.File(d)))
      if (!new java.io.File(tmp).renameTo(new java.io.File(dir)))
        throw new java.io.IOException(s"could not commit compaction $tmp -> $dir")
      batchDirs.clear()
      batchDirs(keep) = dir
    }
  }

  /** Release the corpus cache and (when self-created) the state dir.
    * NOTE: relations returned by [[apply]] are lazy leaf reads over the
    * state table — with a self-owned (temp) statePath they become
    * unreadable after close, so materialize or copy anything still
    * needed first. A caller-provided statePath is left untouched and
    * keeps every returned relation valid.
    */
  def close(): Unit = synchronized {
    corpus.unpersist(blocking = false)
    if (selfOwnedState) rmTree(new java.io.File(stateDir))
  }
}
