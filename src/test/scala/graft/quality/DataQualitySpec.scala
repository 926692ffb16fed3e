package graft.quality

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The checks must actually FIRE on planted defects — a quality suite
  * verified only on clean data proves nothing.
  */
class DataQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("row-local checks count planted nulls, range breaks, and bad values") {
    val ss = spark; import ss.implicits._
    val df = Seq[(java.lang.Double, String)](
      (1.0, "A"), (2.0, "N"), (null, "R"), (99.0, "X"), (3.0, null))
      .toDF("qty", "flag")
    val res = DataQuality.run(df, Seq(
      DataQuality.NotNull("qty"),
      DataQuality.InRange("qty", 0.0, 10.0),
      DataQuality.AcceptedValues("flag", Seq("A", "N", "R"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    assert(res("not_null:qty") == ((1L, false)))
    // null counts as a range violation (fail-closed) + the 99.0 row.
    assert(res("in_range:qty") == ((2L, false)))
    assert(res("accepted_values:flag") == ((2L, false)))
  }

  test("uniqueness counts surplus rows per duplicate key") {
    val ss = spark; import ss.implicits._
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a")).toDF("k", "s")
    val one = DataQuality.uniqueness(df, Seq("k", "s")).collect().head
    assert(one.getLong(1) == 1L && !one.getBoolean(4)) // (1,a) twice
    val both = DataQuality.uniqueness(df, Seq("k")).collect().head
    assert(both.getLong(1) == 2L && !both.getBoolean(4)) // k=1 three times
  }

  test("referential integrity counts orphans incl. null child keys") {
    val ss = spark; import ss.implicits._
    val child = Seq[(java.lang.Long, String)]((1L, "x"), (2L, "y"), (5L, "z"), (null, "w"))
      .toDF("fk", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.referentialIntegrity(child, "fk", parent, "pk", "fk:test").collect().head
    assert(r.getLong(1) == 2L && !r.getBoolean(4)) // 5 and null are orphans
  }

  test("empty input passes vacuously instead of returning null metrics") {
    val ss = spark; import ss.implicits._
    val empty = Seq.empty[(java.lang.Double, String)].toDF("qty", "flag")
    val r = DataQuality.run(empty, Seq(DataQuality.NotNull("qty"))).collect().head
    assert(r.getLong(1) == 0L && r.getDouble(3) == 0.0 && r.getBoolean(4))
    val u = DataQuality.uniqueness(empty, Seq("qty")).collect().head
    assert(u.getLong(1) == 0L && u.getBoolean(4))
    val f = DataQuality.referentialIntegrity(
      empty, "qty", Seq(1.0).toDF("pk"), "pk", "fk:empty").collect().head
    assert(f.getLong(1) == 0L && f.getBoolean(4))
  }

  test("the lineitem PK uniqueness check fires on the real testdata defect") {
    val r = DataQuality.uniqueness(
      graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Seq("l_orderkey", "l_linenumber")).collect().head
    assert(r.getLong(1) > 0 && !r.getBoolean(4))
  }
}
