package graft.multimodal

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.FakeCodec
import graft.sources.DetectionReaders

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("FakeCodec round-trips header fields through encode/decode") {
    for (id <- Seq(0L, 1L, 2L, 97L, 12345L)) {
      val bytes = FakeCodec.encode(id)
      val Some((kind, w, h, len)) = FakeCodec.decodeMeta(bytes)
      assert(kind == FakeCodec.kindByte(id).toInt)
      assert(w == FakeCodec.width(id) && h == FakeCodec.height(id))
      assert(len == FakeCodec.payloadLen(id))
    }
  }

  test("corrupt blobs decode to None, not an exception") {
    assert(FakeCodec.decodeMeta(null).isEmpty)
    assert(FakeCodec.decodeMeta(Array[Byte](1, 2, 3)).isEmpty)
    val bad = FakeCodec.encode(5L); bad(0) = 'X'
    assert(FakeCodec.decodeMeta(bad).isEmpty)
  }

  test("resized: each output byte is the floor-mean of its window; tail dropped; null-safe") {
    val ss = spark
    import ss.implicits._
    val ids = Seq(0L, 7L, 66L) // payload lengths 64, 71, 130 → tails 0, 3, 2
    val df = ids.toDF("media_id")
      .withColumn("bytes", udf((id: Long) => FakeCodec.encode(id)).apply(col("media_id")))
    val got = Multimodal.resized(df, 4)
      .select(col("media_id"), col("resized"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for (id <- ids) {
      val payload = FakeCodec.encode(id).drop(FakeCodec.HeaderLen).map(_ & 0xff)
      val want = payload.grouped(4).filter(_.length == 4).map(w => (w.sum / 4).toByte).toArray
      assert(got(id).sameElements(want), s"id=$id")
      assert(got(id).length == FakeCodec.payloadLen(id) / 4)
    }
    // Corrupt blob → null resized column, no exception.
    val corrupt = Seq(1L).toDF("media_id").withColumn("bytes", lit(Array[Byte](9, 9)))
    assert(Multimodal.resized(corrupt, 4).select(col("resized")).head().isNullAt(0))
  }

  test("withMeta/withFeatures compute from the bytes and match closed form") {
    val df = Multimodal.media(spark, "/root/testdata/sf0.001")
    val metas = Multimodal.withFeatures(Multimodal.withMeta(df))
      .select("media_id", "kind", "width", "payload_len", "mean_byte")
      .collect()
    assert(metas.length == 500)
    metas.take(20).foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == FakeCodec.width(id))
      assert(r.getInt(3) == FakeCodec.payloadLen(id))
      val expected = (0 until FakeCodec.payloadLen(id))
        .map(i => ((id * 31 + i * 7) % 256).toDouble).sum / FakeCodec.payloadLen(id)
      assert(math.abs(r.getDouble(4) - expected) <= 1e-12)
    }
  }

  test("frameSamples emits every 4th 16-byte frame with correct sums") {
    val one = Multimodal.media(spark, "/root/testdata/sf0.001")
      .filter(col("media_id") === 100L)
    val frames = Multimodal.frameSamples(one).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    val len = FakeCodec.payloadLen(100L)
    val expectedIdx = (0 until len / 16 by 4).toSet
    assert(frames.keySet == expectedIdx)
    frames.foreach { case (f, sum) =>
      val want = (0 until 16).map(j => (100L * 31 + (f * 16 + j) * 7) % 256).sum
      assert(sum == want)
    }
  }

  test("the decode seam accepts a REAL codec: javax.imageio JPEGs end-to-end") {
    // Encode real JPEGs in-memory (stock-JDK writer — no native codecs
    // needed), push them through the SAME withMeta seam the declared
    // queries use with FakeCodec, and check dimensions decoded from the
    // actual compressed bytes. Proves "swap the codec" is one argument,
    // not a rewrite.
    import javax.imageio.ImageIO
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", out), "JDK JPEG writer available")
      out.toByteArray
    }
    val dims = Seq((32, 16), (48, 48), (128, 64))
    val rows = dims.zipWithIndex.map { case ((w, h), i) =>
      org.apache.spark.sql.Row(i.toLong, jpeg(w, h))
    } :+ org.apache.spark.sql.Row(99L, Array[Byte](1, 2, 3)) // corrupt blob
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bytes", org.apache.spark.sql.types.BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val decoded = Multimodal.withMeta(df, Multimodal.imageIoDecoder)
      .select("media_id", "kind", "width", "height")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getString(1), r.getInt(2), r.getInt(3))))).toMap
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      assert(decoded(i.toLong).contains(("image", w, h)), s"jpeg $i decoded to ${decoded(i.toLong)}")
    }
    assert(decoded(99L).isEmpty, "corrupt blob → null meta, no exception")
  }

  test("binaryFile source reads blobs from disk; pruned projection skips content") {
    val dir = Files.createTempDirectory("graft_media").toFile
    try {
      for (id <- 0L until 6L)
        Files.write(new java.io.File(dir, s"m_$id.bin").toPath, FakeCodec.encode(id))
      val df = DetectionReaders.binaryImages(spark, dir.getAbsolutePath)
      assert(df.count() == 6)
      // Full read: bytes round-trip through the decode seam.
      val withMeta = df
        .withColumn("media_id",
          regexp_extract(col("path"), "m_(\\d+)\\.bin", 1).cast("long"))
      val decoded = Multimodal.withMeta(withMeta.withColumnRenamed("content", "bytes"))
      assert(decoded.filter(col("kind").isNotNull).count() == 6)
      // Pruned projection: the scan schema must not include content.
      val pruned = df.select("path", "length")
      val scanSchema = pruned.queryExecution.executedPlan.collectLeaves()
        .map(_.schema.fieldNames.toSet).head
      assert(!scanSchema.contains("content"), s"content not pruned: $scanSchema")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
