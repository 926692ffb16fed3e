package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r19 split ray math (per-pose rotMatUdf + per-vertex rayColumns)
  * must be BIT-IDENTICAL to the reference per-vertex rayUdf — the eps
  * oracles downstream (q82/q86/q94) tolerate libm drift across ENGINES,
  * but within Spark the split form claims the exact same doubles, so it
  * is pinned exactly (int64 views, no tolerance).
  */
class RayColumnsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** int64 view of a double — the bit-exact comparator. */
  private val bits = udf((d: Double) => java.lang.Double.doubleToRawLongBits(d))

  test("split pose-matrix + column ray math == reference rayUdf, bit for bit") {
    val rnd = new java.util.Random(7)
    val w = StreetLevel.ImageWidth; val h = StreetLevel.ImageHeight
    // Poses across the angle domain incl. negatives, >360, tiny/huge
    // magnitudes; vertices incl. image corners and the seam.
    val rows = (0 until 5000).map { i =>
      val roll = (rnd.nextDouble() - 0.5) * 720
      val pitch = (rnd.nextDouble() - 0.5) * 360
      val heading = (rnd.nextDouble() - 0.5) * 1440
      val x = i % 7 match {
        case 0 => 0.0; case 1 => w; case 2 => w - 1; case _ => rnd.nextDouble() * w
      }
      val y = i % 5 match { case 0 => 0.0; case 1 => h; case _ => rnd.nextDouble() * h }
      (x, y, roll, pitch, heading,
        (rnd.nextDouble() - 0.5) * 2e6, (rnd.nextDouble() - 0.5) * 2e6,
        rnd.nextDouble() * 100)
    }
    val df = spark.createDataFrame(rows)
      .toDF("x", "y", "roll", "pitch", "heading", "ox", "oy", "oz")
      .withColumn("rm", StreetLevel.rotMatUdf(col("roll"), col("pitch"), col("heading")))
      .withColumn("ref", StreetLevel.rayUdf(
        col("x"), col("y"), col("roll"), col("pitch"), col("heading"),
        col("ox"), col("oy"), col("oz"), lit(w), lit(h)))
    val (rx, ry, rz) = StreetLevel.rayColumns(
      col("x"), col("y"), col("rm"), col("ox"), col("oy"), col("oz"), w, h)
    // Bit-compare through int64 views: -0.0 vs 0.0 or a 1-ulp drift is a
    // FAILURE here even where an eps oracle would absorb it.
    val bad = df.select(
      bits(col("ref._1")).as("e1"), bits(col("ref._2")).as("e2"),
      bits(col("ref._3")).as("e3"),
      bits(rx).as("a1"), bits(ry).as("a2"), bits(rz).as("a3"))
      .filter(col("e1") =!= col("a1") || col("e2") =!= col("a2") || col("e3") =!= col("a3"))
      .count()
    assert(bad == 0L, s"$bad rows diverged bitwise")
  }

  test("vertexRays over corpus detections matches the pre-split shape row-for-row") {
    // End-to-end guard on the operator: the q95 shape (degenerate groups)
    // over real corpus files, new split path vs reference UDF applied to
    // the same exploded relation.
    val dir = "/root/testdata/sf0.001"
    val det = graft.pipeline.Synthetic.detectionsCached(spark, dir)
      .withColumn("group_idx", (col("det_idx") - 1).cast("int"))
    val poses = graft.pipeline.Synthetic.poses(spark, dir)
    val split = StreetLevel.vertexRays(det, poses, spacing = 2, inputIsBestPerGroup = true)
    val ring = array(
      struct(col("x1").as("x"), col("y1").as("y")),
      struct(col("x2").as("x"), col("y1").as("y")),
      struct(col("x2").as("x"), col("y2").as("y")),
      struct(col("x1").as("x"), col("y2").as("y")),
      struct(col("x1").as("x"), col("y1").as("y")))
    val ref = det.join(broadcast(poses), "file_name")
      .select(col("file_name"), col("group_idx"), col("score"),
        col("roll"), col("pitch"), col("heading"),
        col("ox"), col("oy"), col("oz"),
        posexplode(ring).as(Seq("v_idx", "v")))
      .filter(col("v_idx") % 2 === 0)
      .withColumn("ray", StreetLevel.rayUdf(
        col("v.x"), col("v.y"), col("roll"), col("pitch"), col("heading"),
        col("ox"), col("oy"), col("oz"),
        lit(StreetLevel.ImageWidth), lit(StreetLevel.ImageHeight)))
      .select(col("file_name"), col("group_idx"), col("v_idx"),
        col("ray._1").as("rx"), col("ray._2").as("ry"), col("ray._3").as("rz"))
    val joined = split.select(col("file_name"), col("group_idx"), col("v_idx"),
        col("rx"), col("ry"), col("rz"))
      .join(ref, Seq("file_name", "group_idx", "v_idx"))
    val n = joined.count()
    assert(n > 0)
    val bad = joined.filter(
      bits(split("rx")) =!= bits(ref("rx")) ||
      bits(split("ry")) =!= bits(ref("ry")) ||
      bits(split("rz")) =!= bits(ref("rz"))).count()
    assert(bad == 0L, s"$bad corpus rays diverged bitwise")
  }
}
