package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("K1 parquet round-trips") {
    val s = spark; import s.implicits._
    val dir = tmp("k1") + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.writeTable(df, dir)
    assert(spark.read.parquet(dir).orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("K2 CSV stringifies nested columns like pandas to_csv") {
    val s = spark; import s.implicits._
    val dir = tmp("k2") + "/t"
    val df = Seq((1L, Seq(1, 2, 3)), (2L, Seq(4))).toDF("id", "xs")
    Sinks.writeCsv(df, dir, singleFile = true)
    val back = spark.read.option("header", true).csv(dir).orderBy("id").collect()
    assert(back.map(_.getString(1)).toSeq == Seq("[1,2,3]", "[4]"))
  }

  test("K3 JSON lines round-trip nested structs") {
    val s = spark; import s.implicits._
    val dir = tmp("k3") + "/t"
    val df = Seq(("f1", Seq((1, 0.9)), 2)).toDF("file_name", "objects", "n")
    Sinks.writeJson(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 1)
    assert(back.select(size(col("objects"))).head().getInt(0) == 1)
  }

  test("K4 binary sink writes one file per row, partition-side") {
    val s = spark; import s.implicits._
    val dir = tmp("k4")
    val df = Seq(("a.bin", Array[Byte](1, 2, 3)), ("b.bin", Array[Byte](9)))
      .toDF("name", "bytes")
    Sinks.writeBinaryFiles(df, dir)
    val a = Files.readAllBytes(new java.io.File(dir, "a.bin").toPath)
    assert(a.toSeq == Seq[Byte](1, 2, 3))
    assert(new java.io.File(dir, "b.bin").length() == 1)
  }
}
