package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction so Verify, Bench, and tests agree on
  * the config that affects correctness and local performance.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      // graft SQL surface: vector_dot, cylindrical_iou, … available to
      // spark.sql() callers (see org.apache.spark.sql.graft.GraftExtensions).
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Default 64 MB advisory lets AQE coalesce small-but-CPU-heavy
      // shuffles (greedy-grouping kernels, pair joins over few-MB inputs)
      // down to one task. 1 MB keeps those parallel; large scans still
      // coalesce sanely at harness scale.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      // testdata events.ts is parquet TIMESTAMP(NANOS); Spark 4 otherwise
      // refuses the file (PARQUET_TYPE_ILLEGAL). Tables.events converts
      // the long back to TimestampType.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
