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
