package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Mat3, Projection}

class WarpSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val (srcW, srcH) = (256, 128)

  test("view center pixel samples the source point the view axis hits") {
    val id = 7L
    val img = Warp.encodeImage(id, srcW, srcH)
    val pixels = img.drop(Multimodal.FakeCodec.HeaderLen)
    for (theta <- Seq(0, 90, 180, 270)) {
      val view = Warp.warpView(pixels, srcW, srcH, 60, theta, 0, 101, 101)
      // The center output pixel's ray is K⁻¹·(50,50,1) = view axis;
      // compute its source XY with the same (golden-pinned) geometry.
      val (_, kInv) = Projection.calibMatrix(101, 101, 60)
      val r = Projection.viewRotation(theta, 0)
      val (wx, wy, wz) = Mat3.apply(r, Mat3.apply(kInv, (50.0, 50.0, 1.0)))
      val (lon, lat) = Projection.xyzToLonLat(wx, wy, wz)
      val (sx, sy) = Projection.lonLatToXY(lon, lat, srcW, srcH)
      val px = java.lang.Math.floorMod(java.lang.Math.round(sx).toInt, srcW)
      val py = math.min(srcH - 1, math.max(0, java.lang.Math.round(sy).toInt))
      assert(view(50 * 101 + 50) == Warp.pixel(id, px, py), s"theta=$theta")
    }
  }

  test("distinct thetas see distinct source content; output is deterministic") {
    val img = Warp.encodeImage(3L, srcW, srcH).drop(Multimodal.FakeCodec.HeaderLen)
    val v0 = Warp.warpView(img, srcW, srcH, 60, 0, -10, 64, 64)
    val v90 = Warp.warpView(img, srcW, srcH, 60, 90, -10, 64, 64)
    val v0b = Warp.warpView(img, srcW, srcH, 60, 0, -10, 64, 64)
    assert(!v0.sameElements(v90))
    assert(v0.sameElements(v0b))
  }

  test("perspectiveViews operator fans out images × thetas with checksums") {
    val s = spark; import s.implicits._
    val images = (0L until 5L).map(id => (id, Warp.encodeImage(id, 64, 32)))
      .toDF("media_id", "bytes")
    val views = Warp.perspectiveViews(images, 60, Seq(0, 90, 180, 270), -10, 32, 32)
    val rows = views.collect()
    assert(rows.length == 20)
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).distinct.length == 20)
    // Checksum matches an independent re-walk of the view bytes.
    rows.take(3).foreach { r =>
      val view = r.getAs[Array[Byte]]("view")
      var c = 0L
      view.foreach(b => c = (c * 33 + (b & 0xff)) % 1000003L)
      assert(c == r.getLong(3))
      assert(view.length == 32 * 32)
    }
  }
}
