package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.BBox

/** The SQL surface injected by GraftExtensions must agree with the
  * DataFrame API and the pure-Scala kernels.
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("vector_dot is callable from SQL") {
    val v = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(v == 32.0)
  }

  test("sorted_intersect_count is callable from SQL (null-safe)") {
    val v = spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n")
      .head().getInt(0)
    assert(v == 2)
    val withNull = spark.sql(
      "SELECT sorted_intersect_count(array('a', CAST(NULL AS STRING)), array('a')) AS n")
      .head().getInt(0)
    assert(withNull == 1)
  }

  test("vector_avg aggregate is callable from SQL") {
    val rows = spark.sql(
      """SELECT k, vector_avg(v) AS cv FROM VALUES
        |  (0, array(CAST(1.0 AS FLOAT), CAST(3.0 AS FLOAT))),
        |  (0, array(CAST(3.0 AS FLOAT), CAST(5.0 AS FLOAT))),
        |  (1, array(CAST(7.0 AS FLOAT), CAST(9.0 AS FLOAT))) AS t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
    assert(rows.toSeq == Seq(0 -> Seq(2.0, 4.0), 1 -> Seq(7.0, 9.0)))
  }

  test("cylindrical_iou from SQL equals the pure-Scala kernel") {
    val v = spark.sql(
      """SELECT cylindrical_iou(100.0D, 200.0D, 300.0D, 400.0D,
        |                       150.0D, 250.0D, 350.0D, 450.0D,
        |                       8000.0D, 4000.0D) AS iou""".stripMargin)
      .head().getDouble(0)
    val want = BBox((100.0, 200.0, 300.0, 400.0), 0, 0, 8000, 4000)
      .iou(BBox((150.0, 250.0, 350.0, 450.0), 0, 0, 8000, 4000))
    assert(math.abs(v - want) <= 1e-15)
  }
}
