package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

import graft.pipeline.{Dag, InputTable, SessionCache}

/** The ANN serving index, materialized (VERDICT r17 #6): hash-rank
  * anchors plus the two-level fine→coarse route as a fingerprinted
  * InputTable, so a production serving session reads ≤ 65536 index rows
  * on start instead of re-deriving the index from a full corpus scan
  * (count + TakeOrdered) per session. The persisted `corpus_n` seeds
  * the cached corpus count too — every IVF dial (K, nprobe, kc, wc)
  * derives from it, so a reuse tick runs ZERO full-corpus jobs before
  * the query plan itself.
  *
  * Staleness is structural via InputTable's fingerprint (source
  * embeddings files + this derivation text + version): a corpus change
  * moves the fingerprinted path, the stamp watch drops cached plans,
  * and the next ensure rebuilds — the same contract as the dedup
  * tables (`DedupTables.scala`).
  */
object AnnIndexTable extends InputTable(
    "ann_index", "embeddings",
    "anchors=topK(rank=((vec_id%1000003)*2654435761)%1000000007 asc, vec_id asc; " +
      "k=clamp(64,65536,4*floor(sqrt(n))))" +
      "|route=nearest-coarse(kc=min(2*ceil(sqrt(K)),|anchors|), " +
      "score=dot/(nrm*anrm) double-fold, ties->lower-id)" +
      "|cols=(a_id,av,anrm,hrnk,coarse_route,corpus_n)",
    version = 1) {

  protected def dag(sfDir: String): Seq[Dag.Stage] =
    Seq(Dag.Stage("ann_index", Nil, (s, _) => Similarity.annIndexRel(s, sfDir)))

  override protected def onReplaced(sfDir: String): Unit =
    SessionCache.releaseAll(s"annIndex:$sfDir")

  /** Reuse-path replay (the r13 q41 / r17 q80 invariant, enforced
    * sweep-wide by InputTableSeedSpec): a fresh build seeds embN as a
    * side effect of deriving the index; the reuse tick must reach the
    * same state — [[Similarity.annIndex]] seeds both entries from the
    * committed parquet without touching the corpus.
    */
  override def seedSessionCaches(spark: SparkSession, sfDir: String): Unit =
    materializedPath(sfDir).foreach { _ => Similarity.annIndex(spark, sfDir); () }
}
