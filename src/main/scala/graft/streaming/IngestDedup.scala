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
  *      segment directory per commit under `statePath`), and the
  *      returned relation is a leaf read of exactly that segment — rows
  *      never round-trip through the driver.
  *
  * State sizing: driver state is the corpus bloom (fixed size) plus one
  * path string per segment — NO per-digest driver structure, no collect
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
  * min/max + dictionary against the broadcast digests); [[compact]]
  * bounds the segment count, and folding the accepted table into the
  * corpus snapshot periodically is the complementary table-maintenance
  * job — neither is a correctness dependency.
  *
  * Commit discipline, rehydration, and segment retirement live in
  * [[SegmentStore]] (extracted round 8, shared with
  * [[NearDupIngestDeduper]]): nothing committed is deleted before its
  * replacement commits, so duplicate accepted rows across segments can
  * exist after a crash window — harmless to the rejection semi join,
  * and restart-rehydration over the union is exact in every case.
  *
  * Retries: `apply(batch, batchId)` (the foreachBatch signature) is
  * idempotent — a re-run of a batchId excludes that batch's own prior
  * segment from the prior-accepted relation and supersedes it on
  * commit, so a foreachBatch retry after a partial failure reproduces
  * the same output instead of self-rejecting. The 1-arg `apply`
  * auto-increments (monotonic across compactions and restarts).
  *
  * Thread-safe for Structured Streaming's sequential foreachBatch
  * contract (one batch at a time; synchronized defensively).
  */
/** @param autoCompactSegments when > 0, [[compact]] runs automatically
  *   as soon as the retained segment count would exceed it, folding all
  *   segments EXCEPT the batch just committed (whose returned relation
  *   must stay readable, and whose retry must stay idempotent) — so a
  *   long-running stream bounds its per-batch probe fan-out at
  *   `autoCompactSegments + 1` directories without operator
  *   intervention. The compaction-point contracts (see [[compact]])
  *   shift to PRE-current batches only, which is exactly the set the
  *   streaming engine never retries once a later batch has committed.
  *   0 (default) disables: compaction stays caller-driven.
  */
final class IngestDeduper(
    corpusDigests: DataFrame, expectedItems: Long, fpp: Double = 0.01,
    statePath: Option[String] = None, autoCompactSegments: Int = 0)
    extends Serializable {

  private val spark = corpusDigests.sparkSession

  private val corpus = corpusDigests.select(col("digest")).persist()
  private val bloom = corpus.stat.bloomFilter("digest", math.max(expectedItems, 1L), fpp)

  private val stateSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("digest", StringType)))

  /** Segment commit/rehydrate/retire state machine (shared with
    * [[NearDupIngestDeduper]]); this deduper's segments are FLAT — the
    * accepted (doc_id, digest) parquet lives at the segment root.
    */
  private val store = new SegmentStore(statePath)

  /** Accepted rows of this batch: (doc_id, digest), new against corpus,
    * prior batches, and itself. The returned relation is a lazy leaf
    * over the batch's own committed segment — stable until a same-id
    * retry or [[compact]] supersedes it, or [[close]] removes a
    * self-owned state dir; materialize first if held across those.
    */
  def apply(batch: DataFrame): DataFrame = synchronized {
    runBatch(batch, store.nextAutoId)
  }

  /** foreachBatch-shaped entry point: idempotent per batchId (see class
    * notes on retries).
    */
  def apply(batch: DataFrame, batchId: Long): DataFrame = synchronized {
    runBatch(batch, batchId)
  }

  private def runBatch(batch: DataFrame, batchId: Long): DataFrame = {
    // Refuse unparseable ids BEFORE any Spark work (the recovery regex
    // can only read back what it can parse).
    store.checkBatchId(batchId)
    // A retry of the same batchId must not see its own earlier attempt;
    // everything committed stays on disk until the replacement commits.
    val priorDirs = store.priorDirs(excluding = batchId)
    val b = batch.filter(col("digest").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("digest").cast("string").as("digest"))
      .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("digest"))
      .persist() // scanned thrice: maybe-set, batch-digest set, anti join
    // try/finally: a failed micro-batch (executor loss, fetch failure)
    // retries through foreachBatch — without the finally each attempt
    // would leak one persisted batch relation for the stream's life.
    val dir =
      try store.commitBatch(batchId) { tmp =>
        // No distinct: b is already one row per digest (the
        // groupBy(digest) above) — a distinct here would add a useless
        // per-batch exchange to the hot path.
        val maybeDigests = b
          .filter(org.apache.spark.sql.graft.BloomMightContain.column(col("digest"), bloom))
          .select(col("digest"))
        val batchDigests = b.select(col("digest"))
        val acceptedPrior = SegmentStore.readOrEmpty(spark, stateSchema, priorDirs)
        val present = corpus
          .join(broadcast(maybeDigests), Seq("digest"), "left_semi")
          .unionByName(acceptedPrior.select(col("digest"))
            .join(broadcast(batchDigests), Seq("digest"), "left_semi"))
          .distinct()
        b.join(broadcast(present), Seq("digest"), "left_anti")
          .select(col("doc_id"), col("digest"))
          .write.mode("overwrite").parquet(tmp)
      } finally b.unpersist(blocking = false)
    // Auto-compaction: fold everything EXCEPT the segment just
    // committed — the relation returned below stays a valid leaf read,
    // and a foreachBatch retry of THIS batchId keeps its idempotence
    // (its own segment is still excluded-and-superseded on the retry).
    if (autoCompactSegments > 0 && store.segmentCount > autoCompactSegments)
      compactFold(Some(batchId))
    spark.read.schema(stateSchema).parquet(dir)
  }

  /** Driver-held bookkeeping size, for the bounded-state spec: the
    * number of retained segment path strings (there is no per-digest
    * driver structure to measure).
    */
  private[streaming] def retainedBatchCount: Int =
    synchronized(store.segmentCount)

  /** The segment-maintenance job the class notes promise: fold every
    * committed segment into ONE base segment, so the per-batch
    * accepted-table scan stops listing/opening one directory per batch
    * on long-lived streams. Rejection behavior is unchanged. The
    * compacted segment commits BEFORE the old segments are retired
    * (best-effort): a crash in between leaves old + new on disk, whose
    * union merely duplicates rows — harmless to the rejection join and
    * folded away by the next compaction.
    *
    * Call between batches (it shares the deduper's synchronized
    * contract). Two contracts change at the compaction point, so run it
    * only past the stream's committed checkpoint, the same rule any
    * sink compaction obeys: retries of pre-compaction batchIds stop
    * being idempotent (their rows are now prior state), and relations
    * returned for pre-compaction batches are superseded — materialize
    * them first if still needed.
    */
  def compact(): Unit = synchronized { compactFold(None) }

  /** The fold itself; `keep` excludes one batch's segment (the auto-
    * compaction path: the just-committed batch stays a standalone
    * segment so its returned relation and its retry contract survive).
    * Caller holds the monitor.
    */
  private def compactFold(keep: Option[Long]): Unit =
    store.compactExcept(keep) { (olds, tmp) =>
      // distinct(): segments can hold exact row duplicates after a
      // crash between a commit and its cleanup (same batch replayed ⇒
      // identical rows) — fold them here so a crash window costs
      // nothing for the stream's remaining life.
      spark.read.schema(stateSchema).parquet(olds: _*).distinct()
        .write.mode("overwrite").parquet(tmp) // materializes before the swap
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
    store.close()
  }
}
