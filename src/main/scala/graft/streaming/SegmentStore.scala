package graft.streaming

/** The table-backed segment state machine shared by the streaming
  * dedupers ([[IngestDeduper]], [[NearDupIngestDeduper]]): commit
  * discipline, crash-safe rehydration, supersede-after-commit
  * retirement, and base-segment compaction — extracted verbatim from
  * round-7's IngestDeduper so the near-dup deduper shares one state
  * machine instead of forking it.
  *
  * The store manages OPAQUE segment directories: what a segment holds
  * (flat parquet files, or one subdirectory per relation) is the
  * caller's contract — the store only writes-to-tmp, stamps, renames,
  * rehydrates, and retires whole segments.
  *
  * Commit discipline — NOTHING committed is deleted before its
  * replacement commits: every commit (batch or compaction) fills a
  * fresh `t<seq>.tmp`, stamps the store's own `_graft_commit` marker,
  * and ATOMIC_MOVE-renames to a FRESH segment name (`b<id>_<seq>` /
  * `base_<seq>_<hiId>`, seq strictly increasing); superseded segments
  * are deleted best-effort AFTER the in-memory state points at the new
  * one. A crash in any window leaves either the old segments, or
  * old + new — and duplicate rows across segments must be harmless to
  * the caller's read side (both dedupers read the union through a
  * rejection semi join, where duplicates are no-ops).
  *
  * Rehydration (constructor): orphaned `t<seq>.tmp` dirs are swept (by
  * construction uncommitted), a marker-less dir matching our name
  * pattern is ignored as a torn write — EXCEPT a `_SUCCESS`-only dir,
  * which is a LEGACY commit (the pre-marker code both required and
  * produced `_SUCCESS` at the segment root) accepted once and stamped;
  * for a batchId with several committed attempts (crash between commit
  * and cleanup) the latest seq wins and the rest are retired — attempts
  * hold identical rows because foreachBatch replays the same offsets.
  * Note the legacy rule keys on a root-level `_SUCCESS`: segments whose
  * relations live in SUBDIRS put `_SUCCESS` one level down, so only
  * genuinely legacy flat segments can take this path.
  *
  * NOT synchronized on its own: callers serialize access (the dedupers'
  * `synchronized` contract covers every store call).
  */
final class SegmentStore(statePath: Option[String]) extends Serializable {

  /** Segment dirs live under here; removed in [[close]] only when this
    * store created it (a caller-provided path is theirs).
    */
  private val selfOwnedState = statePath.isEmpty
  val stateDir: String = statePath.getOrElse(
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

  /** Stamp the marker, then atomically rename tmp → dir. ATOMIC_MOVE
    * (not `File.renameTo`) so a cross-device statePath fails with a real
    * error message instead of a bare `false`; statePath must live on one
    * filesystem — a real deployment would go through the FileSystem API
    * or a committer.
    */
  private def commitSegment(tmp: String, dir: String): Unit = {
    java.nio.file.Files.createFile(java.nio.file.Paths.get(tmp, CommitMarker))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** batchId → latest committed segment dir; plus the base segments
    * compaction produced. The ONLY per-segment state is one path string
    * (the data lives in the segments). Rehydrated from the on-disk
    * layout when a caller-provided statePath already holds committed
    * segments — a restarted stream must keep rejecting everything
    * accepted before the restart, which is the point of table-backed
    * state. Foreign directory names are ignored, never parsed blindly.
    */
  private val batchDirs = scala.collection.mutable.SortedMap.empty[Long, String]
  private var baseDirs: List[String] = Nil
  private var commitSeq = 0L
  private var nextAutoIdVar = 0L
  locally {
    val committed = scala.collection.mutable.Map.empty[Long, (Long, java.io.File)]
    val kids = new java.io.File(stateDir).listFiles()
    if (kids != null) kids.foreach { f =>
      // Orphaned write-side temp dirs (a crash between the segment write
      // and the commit rename) are by construction uncommitted — sweep
      // them here so a long-lived caller-provided statePath doesn't leak
      // one segment of parquet per crash forever.
      f.getName match {
        case TmpSeg(_) if f.isDirectory => rmTree(f)
        case _ => ()
      }
      val hasMarker = f.isDirectory && new java.io.File(f, CommitMarker).exists()
      val legacy = f.isDirectory && !hasMarker && new java.io.File(f, "_SUCCESS").exists()
      // A segment-NAMED dir with neither marker is a torn retire:
      // retire() deletes the markers FIRST, so a crash mid-rmTree
      // leaves the data without either. (A torn commit cannot produce
      // one — the marker is stamped inside the tmp BEFORE the atomic
      // rename.) Sweep it like a tmp; it was previously ignored but
      // RETAINED — one leaked segment of parquet per crash window on a
      // long-lived caller-provided statePath.
      if (f.isDirectory && !hasMarker && !legacy
          && (BatchSeg.matches(f.getName) || BaseSeg.matches(f.getName)))
        rmTree(f)
      if (legacy && (BatchSeg.matches(f.getName) || BaseSeg.matches(f.getName)))
        try java.nio.file.Files.createFile(f.toPath.resolve(CommitMarker))
        catch { case _: java.io.IOException => () } // best-effort stamp
      if (hasMarker || legacy) f.getName match {
        case BatchSeg(id, seq) =>
          val (i, s) = (id.toLong, seq.toLong)
          commitSeq = math.max(commitSeq, s + 1)
          nextAutoIdVar = math.max(nextAutoIdVar, i + 1)
          committed.get(i) match {
            case Some((prevSeq, prev)) if prevSeq < s =>
              committed(i) = (s, f); retire(prev) // stale attempt, same rows
            case Some(_) => retire(f)
            case None => committed(i) = (s, f)
          }
        case BaseSeg(seq, hiId) =>
          commitSeq = math.max(commitSeq, seq.toLong + 1)
          nextAutoIdVar = math.max(nextAutoIdVar, hiId.toLong)
          baseDirs = f.toString :: baseDirs
        case _ => () // not ours
      }
    }
    committed.foreach { case (id, (_, f)) => batchDirs(id) = f.toString }
  }

  /** The recovery regex can only read back what it can parse — callers
    * check at batch ENTRY (before any Spark work) so the store never
    * commits state a restart would silently drop.
    */
  def checkBatchId(batchId: Long): Unit =
    require(batchId >= 0 && batchId <= 999999999999999999L,
      s"batchId $batchId outside the recoverable range [0, 10^18)")

  /** Auto-increment high-water for the batchId-less entry points
    * (monotonic across compactions and restarts).
    */
  def nextAutoId: Long = nextAutoIdVar

  /** Committed segment dirs a batch must dedup against: every base
    * segment plus every batch segment EXCEPT `excluding`'s own — a retry
    * of a batchId must not see its own earlier attempt.
    */
  def priorDirs(excluding: Long): Seq[String] =
    baseDirs ++ (batchDirs - excluding).values

  /** Retained segment count (base + batch) — the caller-visible bound
    * auto-compaction maintains, and the "driver state is path strings
    * only" measurement the specs pin.
    */
  def segmentCount: Int = batchDirs.size + baseDirs.size

  /** Commit one batch's segment: `write` fills the tmp dir (flat files
    * or subdirs — the caller's layout), then the store stamps, renames
    * to `b<id>_<seq>`, registers it, and retires a superseded same-id
    * attempt best-effort. Returns the committed segment dir.
    */
  def commitBatch(batchId: Long)(write: String => Unit): String = {
    checkBatchId(batchId)
    val tmp = s"$stateDir/t$commitSeq.tmp"
    // A prior attempt that failed AFTER stamping but BEFORE the rename
    // leaves tmp with a stale marker. The flat layout self-healed by
    // accident (parquet overwrite wipes the tmp root); subdir layouts
    // only replace their own subdirs, so the stale root marker would
    // make the re-stamp throw FileAlreadyExistsException forever.
    // Clear the tmp root explicitly: tmp is always fresh.
    rmTree(new java.io.File(tmp))
    write(tmp)
    val dir = s"$stateDir/b${batchId}_$commitSeq"
    commitSegment(tmp, dir)
    commitSeq += 1
    nextAutoIdVar = math.max(nextAutoIdVar, batchId + 1)
    val superseded = batchDirs.get(batchId)
    batchDirs(batchId) = dir
    superseded.foreach(d => retire(new java.io.File(d)))
    dir
  }

  /** Fold every committed segment — except `keep`'s own batch segment,
    * when given (the auto-compaction path: the just-committed batch
    * stays standalone so its returned relation and retry contract
    * survive) — into ONE base segment. `fold` reads the old segment
    * dirs and fills the tmp dir; the compacted segment commits BEFORE
    * the old segments are retired (best-effort): a crash in between
    * leaves old + new, whose union merely duplicates rows. No-op when
    * there is at most one segment to fold — unless `force` (the ANN
    * re-anchor tick: the fold REWRITES segment contents under a new
    * quantizer, so even a single segment must roll into a fresh base).
    */
  def compactExcept(keep: Option[Long], force: Boolean = false)(
      fold: (Seq[String], String) => Unit): Unit = {
    val foldable = keep.fold(batchDirs.toList)(k => (batchDirs - k).toList)
    if (foldable.size + baseDirs.size > (if (force) 0 else 1)) {
      val olds = baseDirs ++ foldable.map(_._2)
      val tmp = s"$stateDir/t$commitSeq.tmp"
      rmTree(new java.io.File(tmp)) // same stale-marker self-heal as commitBatch
      fold(olds, tmp)
      val dir = s"$stateDir/base_${commitSeq}_$nextAutoIdVar"
      commitSegment(tmp, dir)
      commitSeq += 1
      baseDirs = List(dir)
      foldable.foreach { case (id, _) => batchDirs.remove(id): Unit }
      olds.foreach(d => retire(new java.io.File(d)))
    }
  }

  private def rmTree(f: java.io.File): Unit = graft.Fs.rmTree(f)

  /** Delete a COMMITTED segment: markers first (ours, then the legacy
    * `_SUCCESS` a stamped legacy segment still carries), then the data —
    * the [[graft.Fs.uncommitThenDelete]] rule. Plain rmTree deletes
    * children in arbitrary listFiles order, so a crash mid-delete could
    * leave the marker present with data already gone: rehydration would
    * register a torn segment as committed and every later batch's
    * segment read would throw on the missing contents. Marker-first
    * means any crash leaves an UNcommitted dir, which rehydration
    * ignores (or sweeps). Tmp dirs keep plain rmTree — they are
    * uncommitted by construction.
    */
  private def retire(f: java.io.File): Unit =
    graft.Fs.uncommitThenDelete(f, Seq(CommitMarker, "_SUCCESS"))

  /** Remove the state dir when self-created; a caller-provided statePath
    * is left untouched.
    */
  def close(): Unit = if (selfOwnedState) rmTree(new java.io.File(stateDir))
}

object SegmentStore {
  /** The one spelling of "read these segment dirs, or an empty relation
    * when there are none", shared by both dedupers' prior-state reads:
    * `spark.read.parquet(Nil)` throws, and an explicit schema keeps a
    * restart readable even when every segment happens to be empty.
    */
  def readOrEmpty(
      spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      dirs: Seq[String]): org.apache.spark.sql.DataFrame =
    if (dirs.isEmpty) spark.createDataFrame(spark.emptyDataFrame.rdd, schema)
    else spark.read.schema(schema).parquet(dirs: _*)
}
