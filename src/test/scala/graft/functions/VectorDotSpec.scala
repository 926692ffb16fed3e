package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen dot product must be bitwise-identical to the
  * interpreted `aggregate(zip_with(...))` fold it replaced — same
  * accumulation order, same widening.
  */
class VectorDotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bitwise-equal to the HOF fold on the real embeddings (float arrays)") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(broadcast(
        e.filter(col("vec_id") < 3).select(col("embedding").as("b"))))
    val diffs = pairs
      .select(VectorFunctions.dot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diffs.count() == 0)
  }

  test("double arrays and nulls behave like the built-in fold") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val rows = df.select(VectorFunctions.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0))
  }

  test("interpreted path (no codegen) agrees") {
    val s = spark; import s.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 0.5f))).toDF("a", "b")
    // Force interpreted eval through a non-codegen context: collect via
    // the expression's eval by disabling WSCG for this one query.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val v = df.select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0)
      assert(v == 1.0 * 3.0 + 2.0 * 0.5)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
