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
  * Commit discipline — NOTHING committed is deleted before its
  * replacement commits: every commit (batch or compaction) writes to a
  * fresh `.tmp` and renames it to a FRESH segment name (`b<id>_<seq>` /
  * `base_<seq>`, seq strictly increasing), then superseded segments are
  * deleted best-effort AFTER the driver state points at the new one. A
  * crash in any window leaves either the old segments, or old + new —
  * and duplicate accepted rows across segments are harmless to the
  * rejection semi join, so restart-rehydration over the union is exact
  * in every case.
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

  /** Segment dirs live under here; removed in [[close]] only when this
    * deduper created it (a caller-provided path is theirs).
    */
  private val selfOwnedState = statePath.isEmpty
  private val stateDir: String = statePath.getOrElse(
    java.nio.file.Files.createTempDirectory("ingest-dedup-state-").toString)

  private val BatchSeg = "^b(\\d{1,18})_(\\d{1,18})$".r // ASCII digits only
  // base_<commitSeq>_<nextAutoId>: the auto-id high-water rides in the
  // name because compaction erases the per-batch segments it would
  // otherwise be recovered from.
  private val BaseSeg = "^base_(\\d{1,18})_(\\d{1,18})$".r
  private val TmpSeg = "^t(\\d{1,18})\\.tmp$".r

  /** Our own commit marker, independent of the Hadoop committer's
    * `_SUCCESS` convention (which `marksuccessfuljobs=false` disables).
    */
  private val CommitMarker = "_graft_commit"

  /** Commit a fully-written tmp dir as segment `dir`: stamp the marker,
    * then atomically rename. ATOMIC_MOVE (not `File.renameTo`) so a
    * cross-device statePath fails with a real error message instead of a
    * bare `false`; statePath must live on one filesystem — a real
    * deployment would go through the FileSystem API / a committer.
    */
  private def commitSegment(tmp: String, dir: String): Unit = {
    java.nio.file.Files.createFile(java.nio.file.Paths.get(tmp, CommitMarker))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** batchId → latest committed segment dir; plus the base segments
    * compaction produced. The ONLY per-segment driver state is one path
    * string (the accepted digests themselves live in the table).
    * REHYDRATED from the on-disk layout when a caller-provided
    * statePath already holds committed segments — a restarted stream
    * (driver crash, redeploy) must keep rejecting everything accepted
    * before the restart, which is the point of table-backed state.
    * Foreign directory names are ignored, never parsed blindly; for a
    * batchId with several committed attempts (a crash between commit
    * and cleanup) the attempts hold identical rows — foreachBatch
    * replays the same offsets sequentially — so keeping the latest and
    * best-effort-deleting the rest loses nothing.
    */
  private val batchDirs = scala.collection.mutable.SortedMap.empty[Long, String]
  private var baseDirs: List[String] = Nil
  private var commitSeq = 0L
  private var nextAutoId = 0L
  locally {
    val committed = scala.collection.mutable.Map.empty[Long, (Long, java.io.File)]
    val kids = new java.io.File(stateDir).listFiles()
    if (kids != null) kids.foreach { f =>
      // Orphaned write-side temp dirs (a crash between the parquet write
      // and the commit rename) are by construction uncommitted — sweep
      // them here so a long-lived caller-provided statePath doesn't leak
      // one batch of parquet per crash forever.
      f.getName match {
        case TmpSeg(_) if f.isDirectory => rmTree(f)
        case _ => ()
      }
      // A segment counts as committed when it carries OUR marker
      // (written just before the rename): relying on the committer's
      // `_SUCCESS` alone would silently drop ALL accepted state on
      // restart under `marksuccessfuljobs=false` — a silent re-accept
      // instead of a loud failure. A `_SUCCESS`-only dir matching our
      // name pattern is a LEGACY commit (written before the marker
      // existed — the old code both required and produced `_SUCCESS`),
      // accepted once and stamped so the upgrade path never discards
      // committed state either.
      val hasMarker = f.isDirectory && new java.io.File(f, CommitMarker).exists()
      val legacy = f.isDirectory && !hasMarker && new java.io.File(f, "_SUCCESS").exists()
      if (legacy && (BatchSeg.matches(f.getName) || BaseSeg.matches(f.getName)))
        try java.nio.file.Files.createFile(f.toPath.resolve(CommitMarker))
        catch { case _: java.io.IOException => () } // best-effort stamp
      if (hasMarker || legacy) f.getName match {
        case BatchSeg(id, seq) =>
          val (i, s) = (id.toLong, seq.toLong)
          commitSeq = math.max(commitSeq, s + 1)
          nextAutoId = math.max(nextAutoId, i + 1)
          committed.get(i) match {
            case Some((prevSeq, prev)) if prevSeq < s =>
              committed(i) = (s, f); rmTree(prev) // stale attempt, same rows
            case Some(_) => rmTree(f)
            case None => committed(i) = (s, f)
          }
        case BaseSeg(seq, hiId) =>
          commitSeq = math.max(commitSeq, seq.toLong + 1)
          nextAutoId = math.max(nextAutoId, hiId.toLong)
          baseDirs = f.toString :: baseDirs
        case _ => () // not ours
      }
    }
    committed.foreach { case (id, (_, f)) => batchDirs(id) = f.toString }
  }

  /** Accepted rows of this batch: (doc_id, digest), new against corpus,
    * prior batches, and itself. The returned relation is a lazy leaf
    * over the batch's own committed segment — stable until a same-id
    * retry or [[compact]] supersedes it, or [[close]] removes a
    * self-owned state dir; materialize first if held across those.
    */
  def apply(batch: DataFrame): DataFrame = synchronized {
    runBatch(batch, nextAutoId)
  }

  /** foreachBatch-shaped entry point: idempotent per batchId (see class
    * notes on retries).
    */
  def apply(batch: DataFrame, batchId: Long): DataFrame = synchronized {
    runBatch(batch, batchId)
  }

  private def runBatch(batch: DataFrame, batchId: Long): DataFrame = {
    // The recovery regex can only read back what it can parse — refuse
    // to commit state a restart would silently drop.
    require(batchId >= 0 && batchId <= 999999999999999999L,
      s"batchId $batchId outside the recoverable range [0, 10^18)")
    // A retry of the same batchId must not see its own earlier attempt;
    // everything committed stays on disk until the replacement commits.
    val priorDirs = baseDirs ++ (batchDirs - batchId).values
    val tmp = s"$stateDir/t$commitSeq.tmp"
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
    // Commit to a FRESH segment name (never renaming onto an existing
    // dir — no delete-before-commit window), then retire the superseded
    // attempt best-effort.
    val dir = s"$stateDir/b${batchId}_$commitSeq"
    commitSegment(tmp, dir)
    commitSeq += 1
    nextAutoId = math.max(nextAutoId, batchId + 1)
    val superseded = batchDirs.get(batchId)
    batchDirs(batchId) = dir
    superseded.foreach(d => rmTree(new java.io.File(d)))
    // Auto-compaction: fold everything EXCEPT the segment just
    // committed — the relation returned below stays a valid leaf read,
    // and a foreachBatch retry of THIS batchId keeps its idempotence
    // (its own segment is still excluded-and-superseded on the retry).
    if (autoCompactSegments > 0 &&
        batchDirs.size + baseDirs.size > autoCompactSegments)
      compactExcept(Some(batchId))
    spark.read.schema(stateSchema).parquet(dir)
  }

  /** Driver-held bookkeeping size, for the bounded-state spec: the
    * number of retained segment path strings (there is no per-digest
    * driver structure to measure).
    */
  private[streaming] def retainedBatchCount: Int =
    synchronized(batchDirs.size + baseDirs.size)

  private def rmTree(f: java.io.File): Unit = graft.Fs.rmTree(f)

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
  def compact(): Unit = synchronized { compactExcept(None) }

  /** The fold itself; `keep` excludes one batch's segment (the auto-
    * compaction path: the just-committed batch stays a standalone
    * segment so its returned relation and its retry contract survive).
    * Caller holds the monitor.
    */
  private def compactExcept(keep: Option[Long]): Unit = {
    val fold = keep.fold(batchDirs.toList)(k => (batchDirs - k).toList)
    if (fold.size + baseDirs.size > 1) {
      val olds = baseDirs ++ fold.map(_._2)
      val tmp = s"$stateDir/t$commitSeq.tmp"
      // distinct(): segments can hold exact row duplicates after a
      // crash between a commit and its cleanup (same batch replayed ⇒
      // identical rows) — fold them here so a crash window costs
      // nothing for the stream's remaining life.
      spark.read.schema(stateSchema).parquet(olds: _*).distinct()
        .write.mode("overwrite").parquet(tmp) // materializes before the swap
      val dir = s"$stateDir/base_${commitSeq}_$nextAutoId"
      commitSegment(tmp, dir)
      commitSeq += 1
      baseDirs = List(dir)
      fold.foreach { case (id, _) => batchDirs.remove(id): Unit }
      olds.foreach(d => rmTree(new java.io.File(d)))
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
