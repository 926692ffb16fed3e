package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the harness tables (TESTDATA.md). Parquet carries its own
  * schema; explicit schemas are only needed for the schemaless formats
  * (JSON/CSV detection inputs — see [[DetectionReaders]]).
  *
  * All readers take the scale-factor directory so query builders stay
  * pure `(SparkSession, sfDir) => DataFrame` functions.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.Sessions]]),
    * so `ts` arrives as a LongType nanosecond count; normalize it back to
    * a proper TimestampType (microsecond truncation, exact here — the
    * generator emits whole microseconds).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  /** documents/embeddings feed CPU-heavy per-row kernels (shingling,
    * minhash, vector folds, codecs). The testdata files are single-row-
    * group parquet — ONE input split — so without an explicit repartition
    * every downstream map stage and nested-loop join runs in one task.
    * The shuffle is a few MB; the parallelism it buys is ×cores.
    *
    * CONDITIONAL: a real multi-file 100 TB layout already produces
    * thousands of scan splits, and an unconditional repartition(cores)
    * would then shuffle the whole corpus to SHRINK its parallelism. The
    * fan-out only fires when the scan has fewer partitions than cores —
    * on production layouts it is a true no-op (no shuffle at all).
    */
  private[graft] def fanOut(df: DataFrame, s: SparkSession): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(table(s, d, "documents"), s)
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(table(s, d, "embeddings"), s)
}
