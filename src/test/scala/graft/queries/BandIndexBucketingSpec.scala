package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-near-dup scale path (Dedup q69 scaladoc): the corpus
  * MinHash band index written BUCKETED BY (band, key) once per corpus
  * version, so batch probes co-locate against it without shuffling the
  * corpus. This spec materializes that claim with the REAL minhashBands
  * relation: a (band, key)-keyed probe of the bucketed index plans zero
  * exchanges on the corpus side, vs a plain parquet layout of the same
  * rows which must shuffle it. Companion to BucketingSpec (the IVF cell
  * index), closing the same regression gap for q69.
  */
class BandIndexBucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_band").toString
    spark = graft.Sessions.builder("2")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Exchanges in the POST-AQE final plan only: the rendered adaptive
    * plan prints both "== Final Plan ==" and "== Initial Plan ==",
    * which would double-count every exchange.
    */
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    val rendered = df.queryExecution.executedPlan.toString
    val finalOnly = rendered.split("== Initial Plan ==").head
    "Exchange hashpartitioning".r.findAllIn(finalOnly).size
  }

  test("bucketed (band, key) index probes with zero corpus-side shuffles") {
    // Forcing sort-merge joins isolates the bucketing effect — and is
    // the realistic regime: at corpus scale a batch of band keys can
    // exceed the broadcast threshold, which is exactly when the corpus
    // side must not shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bands = Dedup.minhashBands(spark, dir)

      spark.sql("DROP TABLE IF EXISTS mh_band_index")
      bands.write.bucketBy(8, "band", "key").sortBy("band", "key")
        .mode("overwrite").saveAsTable("mh_band_index")
      val index = spark.table("mh_band_index")

      // The q69 probe shape: a batch's band keys against the corpus
      // index on (band, key). Batch = a deterministic slice of the same
      // relation, as incremental ingest would produce.
      val batch = bands.filter(col("doc_id") % 7 === 0)
        .select(col("band"), col("key"), col("doc_id").as("batch_doc"))

      val probedB = index.join(batch, Seq("band", "key"))
        .select(col("doc_id"), col("batch_doc"))
      probedB.collect()
      // Only the batch side may shuffle (into the index's bucketing);
      // the corpus index itself must not.
      val bucketedExchanges = exchanges(probedB)
      assert(bucketedExchanges <= 1,
        s"bucketed index probe should shuffle only the batch side, saw $bucketedExchanges\n" +
          probedB.queryExecution.executedPlan.toString)

      val plainDir = java.nio.file.Files.createTempDirectory("plain_band").toString + "/bands"
      bands.write.mode("overwrite").parquet(plainDir)
      val plain = spark.read.parquet(plainDir)
      val probedP = plain.join(batch, Seq("band", "key"))
        .select(col("doc_id"), col("batch_doc"))
      probedP.collect()
      assert(exchanges(probedP) > bucketedExchanges,
        "plain layout must shuffle more than the bucketed index")

      // Same candidate pairs either way.
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.distinct().orderBy(col("doc_id"), col("batch_doc"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs(probedB) == pairs(probedP))
      assert(pairs(probedB).nonEmpty, "probe must produce candidates on this corpus")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      graft.pipeline.SessionCache.release(spark, s"mhBands:$dir")
      graft.pipeline.SessionCache.release(spark, s"shingleSets:$dir")
    }
  }
}
