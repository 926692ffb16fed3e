package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorAvg
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native vector-avg aggregate must produce element-wise means across
  * partition boundaries (partial + merge path) and reject ragged input.
  */
class VectorAvgSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("element-wise mean across many partitions (exercises merge)") {
    val s = spark; import s.implicits._
    // 100 vectors [i, 2i] over 8 partitions: mean = [49.5, 99.0].
    val df = (0 until 100).map(i => (i % 3, Seq(i.toFloat, (2 * i).toFloat)))
      .toDF("label", "v").repartition(8)
    val got = df.groupBy(col("label")).agg(VectorAvg.column(col("v")).as("cv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    // label 0: i = 0,3,...,99 → mean i = 49.5; label 1: 1,4,...,97 → 49;
    // label 2: 2,5,...,98 → 50.
    assert(got(0) == Seq(49.5, 99.0))
    assert(got(1) == Seq(49.0, 98.0))
    assert(got(2) == Seq(50.0, 100.0))
  }

  test("null vectors are ignored; all-null group yields null") {
    val s = spark; import s.implicits._
    val df = Seq(
      (0, Option(Seq(1.0f, 3.0f))), (0, None),
      (1, None)).toDF("label", "v")
    val rows = df.groupBy(col("label")).agg(VectorAvg.column(col("v")).as("cv"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(rows(0).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)
      == Some(Seq(1.0, 3.0)))
    assert(rows(1).isEmpty)
  }

  test("ragged dimensions in one group fail loudly") {
    val s = spark; import s.implicits._
    val df = Seq((0, Seq(1.0f, 2.0f)), (0, Seq(1.0f))).toDF("label", "v")
    val ex = intercept[Exception] {
      df.groupBy(col("label")).agg(VectorAvg.column(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("matches the posexplode+avg formulation on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.embeddings(spark, dir)
    val native = e.groupBy(col("label"))
      .agg(VectorAvg.column(col("embedding")).as("cv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    val declarative = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim")).agg(avg(col("x").cast("double")).as("a"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("a")))),
        s => s.getField("a")).as("cv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(native.keySet == declarative.keySet)
    for ((k, v) <- native; (a, b) <- v.zip(declarative(k)))
      assert(math.abs(a - b) < 1e-12, s"label $k: $a vs $b")
  }
}
