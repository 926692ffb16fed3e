package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest dedup: the continuous form of the q57 incremental
  * pattern. Each micro-batch of (doc_id, digest) keeps only rows whose
  * digest is in neither the persistent corpus nor any earlier accepted
  * micro-batch, dedup'd within the batch (min doc_id per digest wins).
  *
  * Flow per batch — q57's shape, plus state:
  *   1. bloom prune map-side (native [[org.apache.spark.sql.graft.BloomMightContain]]):
  *      definitely-absent rows skip every join;
  *   2. exact confirm of maybe-hits: anti-join corpus (map-side
  *      semi-filtered by the broadcast maybe-set, never shuffled), then
  *      anti-join the accepted-state digests;
  *   3. accepted digests fold into BOTH the exact state and the bloom,
  *      so later batches prune against everything seen so far. Bloom
  *      inserts are monotone — a false-positive maybe just pays the
  *      exact confirm, so output is exact regardless of fpp drift.
  *
  * State sizing: the accepted set is collected per batch to update the
  * driver-held bloom — micro-batch-sized, the same driver traffic a
  * streaming aggregation's commit log pays. At corpus scale the
  * accepted-state anti-join side persists as a table (here: a cached,
  * re-unioned DataFrame) and the bloom is periodically rebuilt from it;
  * between rebuilds the exact confirm covers the gap, so correctness
  * never depends on the rebuild cadence.
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

  // Exact accepted-state (digests from prior batches). Grows by one
  // union per batch; re-persisted so the lineage stays shallow.
  private var accepted: DataFrame = Seq.empty[String].toDF("digest").persist()

  /** Accepted rows of this batch: (doc_id, digest), new against corpus,
    * prior batches, and itself. Materializes the result (it must — the
    * state update needs the digests) and updates state before returning.
    */
  def apply(batch: DataFrame): DataFrame = synchronized {
    val b = batch.select(col("doc_id"), col("digest"))
      .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("digest"))
    val flagged = b.withColumn("maybe",
      org.apache.spark.sql.graft.BloomMightContain.column(col("digest"), bloom))
    val definite = flagged.filter(!col("maybe")).drop("maybe")
    val maybe = flagged.filter(col("maybe")).drop("maybe")
    val present = corpus
      .join(broadcast(maybe.select(col("digest")).distinct()), Seq("digest"), "left_semi")
      .unionByName(accepted
        .join(broadcast(maybe.select(col("digest")).distinct()), Seq("digest"), "left_semi"))
      .distinct()
    val confirmed = maybe.join(broadcast(present), Seq("digest"), "left_anti")
    val lazyOut = definite.unionByName(confirmed).persist()
    // Materialize to a LEAF result before mutating any state: the lazy
    // plan captures the mutable bloom inside its filter expression, so a
    // post-update recompute could flip a definitely-absent row to
    // maybe — the caller must get rows pinned at this batch's state.
    val rows = lazyOut.select(col("doc_id"), col("digest"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    lazyOut.unpersist(blocking = false)
    rows.map(_._2).foreach(bloom.putString)
    val prev = accepted
    accepted = prev.unionByName(rows.map(_._2).toSeq.toDF("digest")).persist()
    accepted.count() // materialize from prev before dropping it
    prev.unpersist(blocking = false)
    rows.toSeq.toDF("doc_id", "digest")
  }

  /** Release all state (corpus + accepted caches). */
  def close(): Unit = synchronized {
    corpus.unpersist(blocking = false)
    accepted.unpersist(blocking = false)
  }
}
