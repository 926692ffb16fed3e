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
