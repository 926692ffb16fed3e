package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q39's oracle asserts `within_bound = true` for every group × metric —
  * that is only evidence if the band is DISCRIMINATING: a value outside
  * the sketch guarantee must fail it. Both directions checked here.
  */
class ApproxSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every sketch lands inside its error band on the real data") {
    val rows = graft.SparkEntry.queries("q39_approx_sketches")(spark, dir).collect()
    assert(rows.length == 9)
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      rows.filterNot(_.getAs[Boolean]("within_bound")).mkString(", "))
  }

  test("negative control: a value far from the true percentile fails the band") {
    // Re-apply q39's band arithmetic (accuracy 10000, two-sided, 2×+2
    // margin) to a deliberately wrong "estimate": the group's p75 offered
    // as a p50. Its rank distance is ~0.25·n ≫ 2·n/10000 + 2.
    val li = graft.sources.Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "A")
    val n = li.count()
    val fake = li.stat.approxQuantile("l_extendedprice", Array(0.75), 0.001).head
    val cnts = li.agg(
      sum(when(col("l_extendedprice") < fake, 1L).otherwise(0L)).as("lt"),
      sum(when(col("l_extendedprice") <= fake, 1L).otherwise(0L)).as("le")).head()
    val (lt, le) = (cnts.getLong(0), cnts.getLong(1))
    val tol = n * 2.0 / 10000 + 2.0
    val target = 0.5 * n
    val withinBound = target >= lt + 1 - tol && target <= le + tol
    assert(!withinBound, s"p75-as-p50 must fail: target=$target lt=$lt le=$le tol=$tol")
  }
}
