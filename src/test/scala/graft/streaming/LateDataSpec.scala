package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

case class EvId(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** The watermark late-DROP contract (VERDICT r13 #4): q60-q65 verify
  * window aggregation on in-order replays, where the watermark never
  * drops anything. This spec replays the REAL corpus in the q108 arrival
  * order (heavy-tail stragglers, 6-hour arrival batches) through
  * MemoryStream with `withWatermark("ts", "30 minutes")` and asserts
  * Structured Streaming's tumbling aggregate equals the batch aggregate
  * over exactly the rows [[EventStreams.lateClassified]] calls on-time —
  * i.e. the declared classification (and therefore the q108 DuckDB
  * oracle) IS what Spark drops, boundary rules and ms-floor included.
  */
class LateDataSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming drops exactly the rows the batch classification calls late") {
    val s = spark; import s.implicits._
    implicit val sq = spark.sqlContext
    // First 9 days of the sf0.001 corpus: 308 events over 36 arrival
    // buckets with 5 genuinely late rows (probed; asserted below so the
    // test can never pass vacuously on a regenerated corpus).
    val input = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("ts") < lit("2024-01-10").cast("timestamp_ntz"))
    val classified = EventStreams.lateClassified(input)
      .select(col("batch_id"), col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"), col("value"), col("late"))
      .collect()
    val nLate = classified.count(_.getAs[Boolean]("late"))
    assert(nLate >= 3, s"fixture must contain real late rows, got $nLate")
    assert(classified.length > 200)

    // Replay in arrival order: one micro-batch per 6-hour arrival
    // bucket, exactly the q108 model.
    val buckets = classified.groupBy(_.getAs[Long]("batch_id")).toSeq.sortBy(_._1)
    val mem = MemoryStream[EvId]
    val sink = s"late_sink_${System.nanoTime()}"
    val q = EventStreams.tumbling(mem.toDF().withWatermark("ts", "30 minutes"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    buckets.foreach { case (_, rows) =>
      mem.addData(rows.toSeq.map(r => EvId(r.getAs[Long]("event_id"),
        r.getAs[Timestamp]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"))))
      q.processAllAvailable()
    }
    // Far-future flush so every watermark-gated window emits.
    mem.addData(EvId(-1L, Timestamp.valueOf("2024-06-01 00:00:00"), "flush", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(sink)
      .filter(col("event_type") =!= "flush")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // Batch aggregate over the on-time rows ONLY — if Spark dropped one
    // row more or fewer than the classification says, some window's
    // (n, total) diverges.
    val onTime = classified.filter(!_.getAs[Boolean]("late"))
      .toSeq.map(r => EvId(r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val expected = EventStreams.tumbling(onTime.toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == expected,
      s"only-streamed=${streamed -- expected} only-batch=${expected -- streamed}")

    // And the drop is REAL: aggregating all rows (late included) must
    // differ, or the fixture exercised nothing.
    val withLate = EventStreams.tumbling(classified.toSeq.map(r =>
        EvId(r.getAs[Long]("event_id"), r.getAs[Timestamp]("ts"),
          r.getAs[String]("event_type"), r.getAs[Double]("value"))).toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(withLate != expected, "late rows must change some window's aggregate")
  }
}
