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
