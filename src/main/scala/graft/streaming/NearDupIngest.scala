package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}
import graft.functions.{DedupFunctions => DF, TextFunctions => TF}

/** Streaming NEAR-dup ingest: the continuous form of q69's incremental
  * MinHash/LSH check, running the SAME hash family, shingling, and
  * banding as the batch queries (q41/q42/q69 — one spelling, via
  * [[graft.functions.DedupFunctions.bandRows]]). Each micro-batch of
  * (doc_id, text) keeps only documents that are NOT near-duplicates
  * (Jaccard ≥ `threshold` on 3-token shingle sets) of the persistent
  * corpus, of anything accepted in an earlier batch, or of a smaller-id
  * document in the same batch.
  *
  * Flow per batch — the q69 probe shape, plus table-backed state:
  *   1. batch docs → shingle sets → MinHash band keys (map-only; a
  *      micro-batch, so this relation is small by construction);
  *   2. CANDIDATES = docs sharing ≥1 band with a batch doc, from three
  *      places: the corpus band index, the accepted-state band index,
  *      and the batch itself (smaller-id side only). The two big sides
  *      are scanned and pruned MAP-SIDE against the broadcast batch
  *      bands — neither the corpus nor the accepted state ever
  *      shuffles (BandIndexBucketingSpec's layout claim: at scale the
  *      corpus index is a bucketed table and this probe plans zero
  *      corpus-side exchanges);
  *   3. VERIFY: only candidate pairs pay the exact Jaccard — the big
  *      shingle relations are scanned once each, joined map-side
  *      against the broadcast (candidate ids × batch shingles) set;
  *   4. accepted rows (shingles + their band keys) are WRITTEN to the
  *      state segment and the returned relation is a leaf read of that
  *      committed segment. Doc BODIES never enter the state table —
  *      state is shingles and band keys only, the same "text never
  *      enters a handoff table" rule as the curation DAG.
  *
  * Within-batch policy: a doc is rejected when a verified near-dup
  * SMALLER id exists in the same batch — one round of q55's min-label
  * rule (a node with a smaller neighbor is not its component's min).
  * Chains inside one micro-batch (B dups A, C dups B but not A) keep
  * only the component head, matching q55's cluster-collapse semantics,
  * not sequential-greedy's "C survives because B died" — micro-batches
  * are small, and full transitive resolution over the accumulated state
  * is q55's periodic batch kernel, not a per-batch job.
  *
  * Recall contract (exactly q42/q69's): rejection is exact over the
  * LSH CANDIDATE set — a true near-dup pair missed by every band is not
  * seen (the banding's recall is itself differentially verified by
  * q42/q69's oracles). Docs with FEWER than 3 tokens have an empty
  * shingle set, hence no n-gram identity: they produce null band keys,
  * are never candidates, and are always accepted.
  *
  * Scale notes: the corpus shingle/band relations are persisted here at
  * construction (one corpus pass builds the index — "written once per
  * corpus version", q69's artifact). At 100 TB both live as bucketed
  * parquet tables instead; every per-batch plan above already treats
  * them as scan-only (map-side pruned, never shuffled), so swapping the
  * persist for a bucketed read changes no join shape. Driver state is
  * one path string per segment ([[SegmentStore]]); per-batch broadcasts
  * are bounded by micro-batch size × candidate count, never by corpus
  * size.
  *
  * Commit discipline, rehydration, retries, compaction: all inherited
  * from [[SegmentStore]] — `apply(batch, batchId)` is idempotent per
  * batchId, restart over a caller-provided statePath rehydrates, and
  * `autoCompactSegments` bounds segment fan-out exactly as in
  * [[IngestDeduper]].
  */
/** @param corpusBandIndex when given, used as the corpus band index
  *   (doc_id, band, key) INSTEAD of deriving it from `corpusShingles` —
  *   the production shape: the index is a persisted artifact written
  *   once per corpus version (bucketed by (band, key), the
  *   BandIndexBucketingSpec layout), and a restarted stream reads it
  *   rather than re-running the signature kernel over the corpus. Must
  *   be the SAME banding family ([[graft.functions.DedupFunctions.bandRows]])
  *   over the same corpus — NearDupIngestSpec pins result equality
  *   between the two constructions.
  */
final class NearDupIngestDeduper(
    corpusShingles: DataFrame, // (doc_id, shingles array<string>), distinct shingles
    threshold: Double = 0.5,
    statePath: Option[String] = None,
    autoCompactSegments: Int = 0,
    corpusBandIndex: Option[DataFrame] = None)
    extends Serializable {

  private val spark = corpusShingles.sparkSession

  private val corpusSh = corpusShingles
    .select(col("doc_id").cast("long").as("doc_id"), col("shingles"))
    .persist()
  /** The corpus band index — q69's persistent artifact, built in one
    * pass at construction when not provided pre-built.
    */
  private val corpusBands = corpusBandIndex
    .map(_.select(col("doc_id").cast("long").as("doc_id"), col("band"), col("key")))
    .getOrElse(DF.bandRows(corpusSh))
    // Empty-shingle docs carry null band keys; null never equi-joins,
    // so the rows are dead weight in an index scanned every batch —
    // drop them here (and on the state-side write below).
    .filter(col("key").isNotNull)
    .persist()

  private val shSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("shingles", ArrayType(StringType))))
  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band", IntegerType),
    StructField("key", LongType)))

  private[streaming] val store = new SegmentStore(statePath)

  /** Shingle relation of a batch of (doc_id, text): null texts are
    * dropped explicitly up front (no text ⇒ no shingle identity to
    * dedup on; silent three-valued filtering would lose them without a
    * trace), duplicate ids are the caller's contract violation.
    */
  private def shingleRel(batch: DataFrame): DataFrame =
    batch.filter(col("text").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"),
        TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TF.shingles(col("toks"), 3).as("shingles"))

  /** Accepted documents of this batch: (doc_id, shingles), near-dup-free
    * against corpus, prior batches, and smaller batch ids. Leaf read of
    * the committed segment — same stability contract as
    * [[IngestDeduper.apply]].
    */
  def apply(batch: DataFrame): DataFrame = synchronized {
    runBatch(batch, store.nextAutoId)
  }

  /** foreachBatch-shaped entry point: idempotent per batchId. */
  def apply(batch: DataFrame, batchId: Long): DataFrame = synchronized {
    runBatch(batch, batchId)
  }

  private def runBatch(batch: DataFrame, batchId: Long): DataFrame = {
    store.checkBatchId(batchId)
    val priorDirs = store.priorDirs(excluding = batchId)
    // Persisted: consumed by the band build, three verify arms, and the
    // anti join; recomputing the shingle kernel per consumer would also
    // re-read the (possibly already-gone) streaming source.
    val b = shingleRel(batch).persist()
    // Null band keys (empty-shingle docs) never equi-join — filtered at
    // creation so they ride neither the per-batch broadcasts, nor the
    // self-join, nor the state write.
    val bBands = DF.bandRows(b).filter(col("key").isNotNull).persist()
    // Per-arm candidate sets persist for (count → verify → write) and
    // release with the batch — tracked here so a failed batch can't
    // leak one cached relation per arm per retry.
    val candCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val dir =
      try store.commitBatch(batchId) { tmp =>
        val priorSh = SegmentStore.readOrEmpty(spark, shSchema, priorDirs.map(_ + "/sh"))
        val priorBands = SegmentStore.readOrEmpty(spark, bandSchema, priorDirs.map(_ + "/bands"))

        // Candidate batch↔big pairs: the big band index is scanned and
        // pruned map-side by the broadcast batch bands (never shuffled).
        def candsAgainst(big: DataFrame): DataFrame =
          big.as("c").join(broadcast(bBands.as("p")),
              col("c.band") === col("p.band") && col("c.key") === col("p.key"))
            .select(col("p.doc_id").as("b_id"), col("c.doc_id").as("c_id"))
            .distinct()

        // Exact verify. Only the candidate ID SET broadcasts (8-byte ids
        // — bounded at any corpus or batch size); the big shingle
        // relation is pruned MAP-SIDE to candidate rows before any
        // shingle array moves, and the pruned relation, the candidate
        // pairs, and the batch shingles assemble via SMJ — every
        // post-prune side is candidate/batch-bounded and nothing
        // candidate-VOLUME-scaled is ever broadcast. (r13 sf100-volume
        // streaming rehearsal: the old broadcast of candidates WITH
        // their shingle arrays — "bounded by candidates × shingle size"
        // — is exactly a bound that GROWS with collision volume, and at
        // 2.5M streamed docs / ~200k-doc batches it exceeded driver
        // memory. The q53 lesson in streaming form: bound verify
        // traffic, and never let a broadcast scale with it.) Each arm's
        // candidate set is persisted and COUNTED first: when a probe
        // finds no band collisions (the common case for a clean
        // micro-batch), the arm's shingle relation is never scanned at
        // all.
        def verified(cands0: DataFrame, bigSh: => DataFrame): Option[DataFrame] = {
          val cands = cands0.persist()
          candCaches += cands
          if (cands.count() == 0) None
          else Some {
            val candIds = cands.select(col("c_id")).distinct()
            val prunedBig = bigSh
              .select(col("doc_id").as("c_id"), col("shingles").as("c_sh"))
              .join(broadcast(candIds), Seq("c_id"), "left_semi")
            prunedBig.hint("merge")
              .join(cands.hint("merge"), "c_id")
              .hint("merge")
              .join(b.select(col("doc_id").as("b_id"), col("shingles").as("b_sh"))
                .hint("merge"), "b_id")
              .filter(DF.jaccard(col("b_sh"), col("c_sh")) >= threshold)
              .select(col("b_id"))
          }
        }

        // Within-batch: both sides tiny; smaller-id partner rejects.
        val selfCands = bBands.as("x").join(bBands.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") > col("y.doc_id"))
          .select(col("x.doc_id").as("b_id"), col("y.doc_id").as("c_id"))
          .distinct()

        val arms = Seq(
          verified(candsAgainst(corpusBands), corpusSh),
          verified(candsAgainst(priorBands), priorSh),
          verified(selfCands, b)).flatten
        val rejected = arms
          .reduceOption(_ unionByName _).map(_.distinct())
          .getOrElse(spark.createDataFrame(spark.emptyDataFrame.rdd,
            StructType(Seq(StructField("b_id", LongType)))))

        b.join(broadcast(rejected.withColumnRenamed("b_id", "doc_id")),
            Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$tmp/sh")
        // Band rows of exactly what was written (read back, semi join
        // the persisted batch bands — already null-key-free): the state
        // index can never drift from the state shingles, even across a
        // partial failure.
        bBands
          .join(
            broadcast(spark.read.schema(shSchema).parquet(s"$tmp/sh")
              .select(col("doc_id"))),
            Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$tmp/bands")
      } finally {
        candCaches.foreach(_.unpersist(blocking = false))
        bBands.unpersist(blocking = false)
        b.unpersist(blocking = false)
      }
    if (autoCompactSegments > 0 && store.segmentCount > autoCompactSegments)
      compactFold(Some(batchId))
    spark.read.schema(shSchema).parquet(s"$dir/sh")
  }

  private[streaming] def retainedBatchCount: Int =
    synchronized(store.segmentCount)

  /** Fold all committed segments into one base segment (see
    * [[IngestDeduper.compact]] for the compaction-point contracts).
    */
  def compact(): Unit = synchronized { compactFold(None) }

  private def compactFold(keep: Option[Long]): Unit =
    store.compactExcept(keep) { (olds, tmp) =>
      // distinct() folds the exact-duplicate rows a crash-between-
      // commit-and-cleanup window can leave across segments.
      spark.read.schema(shSchema).parquet(olds.map(_ + "/sh"): _*).distinct()
        .write.mode("overwrite").parquet(s"$tmp/sh")
      spark.read.schema(bandSchema).parquet(olds.map(_ + "/bands"): _*).distinct()
        .write.mode("overwrite").parquet(s"$tmp/bands")
    }

  /** Release the corpus caches and (when self-created) the state dir —
    * the [[IngestDeduper.close]] contract.
    */
  def close(): Unit = synchronized {
    corpusBands.unpersist(blocking = false)
    corpusSh.unpersist(blocking = false)
    store.close()
  }
}
