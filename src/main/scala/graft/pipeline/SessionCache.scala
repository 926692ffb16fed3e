package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized intermediates: the pattern a real pipeline
  * uses for a stage consumed by several downstream jobs. Synchronized
  * compute-if-absent (a concurrent first access must not persist the plan
  * twice); entries evict when the owning context ends, so a long-lived
  * JVM cycling sessions doesn't retain stale SparkSession references.
  *
  * Entries can also be released EARLY via [[release]] once their last
  * consumer has materialized — a long-lived 100 TB session must not
  * accumulate one persisted relation per pipeline stage for its whole
  * life. Release is purely a storage knob: a consumer arriving after a
  * release simply rebuilds the entry through [[getOrPersist]], so a wrong
  * release point costs recompute, never correctness. Query definitions
  * declare their release points ([[graft.queries.QueryDef.releases]]) and
  * the sweep harnesses (Verify/Bench) fire them after each query's
  * action completes — releasing mid-plan would drop storage a pending
  * lazy consumer was counting on.
  */
object SessionCache {

  private val cache =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private val hooked =
    scala.collection.mutable.Set.empty[SparkSession]

  def getOrPersist(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      if (hooked.add(spark)) {
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            SessionCache.synchronized {
              cache.filterInPlace((k, _) => k._1 != spark)
              hooked.remove(spark)
            }
        })
      }
      cache.getOrElseUpdate((spark, key), {
        val df = build
        // A build block may hand back an already-persisted (even
        // materialized) relation when it manages its own intermediate
        // lifecycle (q55); persisting again would only log a warning.
        if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.persist()
        else df
      })
    }

  /** Drop an entry and unpersist its storage (no-op for absent keys). */
  def release(spark: SparkSession, key: String): Unit = synchronized {
    cache.remove((spark, key)).foreach(_.unpersist(blocking = false))
  }

  /** Live entry keys for a session — spec hook for bounded-storage
    * assertions during a full Registry sweep.
    */
  def liveKeys(spark: SparkSession): Set[String] = synchronized {
    cache.keysIterator.filter(_._1 eq spark).map(_._2).toSet
  }
}
