package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The IVF scale path (Similarity q51 scaladoc): the corpus written
  * BUCKETED BY cell so per-cell probes co-locate without a shuffle.
  * This spec materializes that claim: a cell-keyed self-join over the
  * bucketed table plans ZERO exchanges, vs ≥2 for the plain parquet
  * layout of the same data.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark = graft.Sessions.builder("2")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Count shuffle exchanges in the FINAL (post-AQE) physical plan —
    * AdaptiveSparkPlanExec hides its executed sub-plan from a plain
    * collect, so count on the rendered final plan.
    */
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("bucketed-by-cell corpus joins with zero shuffles; plain parquet shuffles") {
    val s = spark; import s.implicits._
    // Force sort-merge joins so the comparison isolates the bucketing
    // effect (a broadcast join would hide the shuffle on both layouts;
    // at corpus scale the big side can't broadcast anyway).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val corpus = (0L until 2000L).map(i => (i, i % 16, s"v$i")).toDF("vec_id", "cell", "payload")

    spark.sql("DROP TABLE IF EXISTS ivf_corpus")
    corpus.write.bucketBy(8, "cell").sortBy("cell")
      .mode("overwrite").saveAsTable("ivf_corpus")

    val bucketed = spark.table("ivf_corpus")
    val joinedB = bucketed.as("a").join(bucketed.as("b"), "cell")
      .groupBy(col("cell")).count()
    joinedB.collect()
    // Bucketed self-join on the bucket key: only the post-agg exchange
    // (for the final single-key aggregate) may remain; the JOIN itself
    // must not shuffle either side.
    val joinPlanExchanges = exchanges(joinedB)
    assert(joinPlanExchanges <= 1, s"bucketed join should not shuffle, saw $joinPlanExchanges exchanges")

    val plainDir = java.nio.file.Files.createTempDirectory("plain").toString + "/corpus"
    corpus.write.mode("overwrite").parquet(plainDir)
    val plain = spark.read.parquet(plainDir)
    val joinedP = plain.as("a").join(plain.as("b"), "cell")
      .groupBy(col("cell")).count()
    joinedP.collect()
    assert(exchanges(joinedP) > joinPlanExchanges,
      "plain layout must shuffle more than the bucketed layout")

    // Same results either way.
    assert(joinedB.orderBy("cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      joinedP.orderBy("cell").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
