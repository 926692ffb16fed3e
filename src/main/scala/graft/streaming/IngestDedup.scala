package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest dedup: the continuous form of the q57 incremental
  * pattern. Each micro-batch of (doc_id, digest) keeps only rows whose
  * digest is in neither the persistent corpus nor any earlier accepted
  * micro-batch, dedup'd within the batch (min doc_id per digest wins).
  * Rows with a null digest are dropped explicitly up front (an
  * undigestable row has no dedup identity; silently three-valued
  * filtering would lose them without a trace).
  *
  * Flow per batch — q57's two-scan shape, plus state:
  *   1. scan 1: the native [[org.apache.spark.sql.graft.BloomMightContain]]
  *      probe projects the maybe-digest set (tiny: true dups + fpp tail);
  *   2. `present` = (corpus ∩ maybe) via a map-side semi join against
  *      the broadcast maybe-set (the corpus is scanned, never shuffled),
  *      unioned with the driver-held accepted set — so rejection against
  *      prior batches is exact even independent of the bloom;
  *   3. scan 2: ONE anti join of the batch against broadcast(present).
  *      No maybe/definite union: the bloom has no false negatives, so
  *      present ⊇ batch ∩ (corpus ∪ accepted) and the anti join is
  *      exact for any fpp.
  *   4. accepted digests fold into the driver state and the bloom, so
  *      later batches prune map-side against everything seen so far.
  *
  * State sizing: accepted digests live on the driver (they are
  * collected anyway to update the driver-held bloom) — micro-batch
  * ingest accumulates them at ingest rate, the same order as a
  * streaming aggregation's state. At corpus scale the accepted set
  * persists as a table instead, the bloom is rebuilt from it
  * periodically, and `present` gains one more semi join against that
  * table; correctness never depends on the rebuild cadence because the
  * exact confirm covers the gap.
  *
  * Thread-safe for Structured Streaming's sequential foreachBatch
  * contract (one batch at a time; synchronized defensively).
  */
final class IngestDeduper(corpusDigests: DataFrame, expectedItems: Long, fpp: Double = 0.01)
    extends Serializable {

  private val spark = corpusDigests.sparkSession
  import spark.implicits._

  private val corpus = corpusDigests.select(col("digest")).persist()
  private val bloom = corpus.stat.bloomFilter("digest", math.max(expectedItems, 1L), fpp)

  // Exact accepted-state from prior batches, driver-held (see scale
  // note above). Rebuilt as a LEAF DataFrame per batch — a growing
  // union chain would deepen the logical plan by one node per
  // micro-batch and stack-overflow the analyzer on long-lived streams.
  private val acceptedSet = scala.collection.mutable.HashSet.empty[String]

  /** Accepted rows of this batch: (doc_id, digest), new against corpus,
    * prior batches, and itself. Materializes the result (the state
    * update needs the digests) and updates state before returning; the
    * returned relation is a leaf over the materialized rows, immune to
    * the bloom mutating underneath a lazy recompute.
    */
  def apply(batch: DataFrame): DataFrame = synchronized {
    val b = batch.filter(col("digest").isNotNull)
      .select(col("doc_id"), col("digest"))
      .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("digest"))
      .persist() // scanned twice: maybe-set build + the anti join
    // try/finally: a failed micro-batch (executor loss, fetch failure)
    // retries through foreachBatch — without the finally each attempt
    // would leak one persisted batch relation for the stream's life.
    val rows = try {
      val maybeDigests = b
        .filter(org.apache.spark.sql.graft.BloomMightContain.column(col("digest"), bloom))
        .select(col("digest")).distinct()
      val present = corpus
        .join(broadcast(maybeDigests), Seq("digest"), "left_semi")
        .distinct()
        .unionByName(acceptedSet.toSeq.toDF("digest"))
      b.join(broadcast(present), Seq("digest"), "left_anti")
        .select(col("doc_id"), col("digest"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
    } finally b.unpersist(blocking = false)
    rows.foreach { case (_, dg) => bloom.putString(dg); acceptedSet += dg }
    rows.toSeq.toDF("doc_id", "digest")
  }

  /** Release the corpus cache. */
  def close(): Unit = synchronized {
    corpus.unpersist(blocking = false)
  }
}
