package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized intermediates: the pattern a real pipeline
  * uses for a stage consumed by several downstream jobs. Synchronized
  * compute-if-absent (a concurrent first access must not persist the plan
  * twice); entries evict when the owning context ends, so a long-lived
  * JVM cycling sessions doesn't retain stale SparkSession references.
  */
object SessionCache {

  private val cache =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]

  def getOrPersist(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      cache.getOrElseUpdate((spark, key), {
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            SessionCache.synchronized { cache.filterInPlace((k, _) => k._1 != spark) }
        })
        build.persist()
      })
    }
}
