package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference-shaped detection inputs (FIXTURES.md §B,
  * SURVEY.md §2 S1/S2/S5). Explicit schemas throughout — JSON inference
  * is a second scan of 100 TB; fixed StructTypes are the idiomatic answer
  * and keep the DuckDB oracle deterministic (SURVEY §1.3).
  */
object DetectionReaders {

  /** GeoJSON-ish polygon struct: `{"type": ..., "coordinates": [[[x,y]...]]}`.
    * The reference writes `''` for degenerate masks
    * (street_level_grouping.py:71); with a fixed schema that arrives as a
    * null struct, filtered by the F1 analogue `isNotNull`.
    */
  val polygonType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType))))))

  val detectedObjectType: StructType = StructType(Seq(
    StructField("bbox", ArrayType(IntegerType)),
    StructField("polygon", polygonType),
    StructField("score", DoubleType),
    StructField("class", IntegerType)))

  /** results.json schema (FIXTURES.md B1): one row per photo with nested
    * per-object array.
    */
  val resultsSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("objects", ArrayType(detectedObjectType))))

  /** S1: whole-file JSON results → one row per detected object, carrying
    * the parent file_name — the `pd.json_normalize(data, 'objects',
    * 'file_name')` analogue (detected_objects_processing.py:19-21).
    */
  def resultsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).schema(resultsSchema).json(path)
      .select(col("file_name"), posexplode(col("objects")).as(Seq("det_idx", "o")))
      .select(col("file_name"), col("det_idx"), col("o.bbox").as("bbox"),
        col("o.polygon").as("polygon"), col("o.score").as("score"),
        col("o.class").as("class"))

  /** S2: tab-separated camera-pose reference file
    * (street_level_grouping.py:139-142; columns from use at :184-189).
    */
  val poseSchema: StructType = StructType(Seq(
    StructField("file_name", StringType),
    StructField("roll[deg]", DoubleType),
    StructField("pitch[deg]", DoubleType),
    StructField("heading[deg]", DoubleType),
    StructField("projectedX[m]", DoubleType),
    StructField("projectedY[m]", DoubleType),
    StructField("projectedZ[m]", DoubleType)))

  def poseTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", true).schema(poseSchema).csv(path)

  /** S5: per-view prediction files `{theta}_{photo_stem}.json`
    * (street_level_grouping.py:52-66). The listdir suffix-matching loop
    * becomes a path parse: theta and photo stem are recovered from
    * `input_file_name()`, turning the O(photos×files) directory scan into
    * plain columns ready for an equi-join (SURVEY §2 J2).
    */
  val predictionSchema: StructType = StructType(Seq(
    StructField("bboxes", ArrayType(ArrayType(IntegerType))),
    StructField("labels", ArrayType(IntegerType)),
    StructField("scores", ArrayType(DoubleType)),
    StructField("masks", ArrayType(StructType(Seq(
      StructField("size", ArrayType(IntegerType)),
      StructField("counts", StringType)))))))

  def predictionsJson(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("multiLine", true).schema(predictionSchema).json(dir)
      .withColumn("_file", regexp_extract(input_file_name(), "([^/]+)\\.json$", 1))
      .withColumn("theta", split(col("_file"), "_").getItem(0).cast(IntegerType))
      .withColumn("photo_stem", regexp_replace(col("_file"), "^\\d+_", ""))
      .drop("_file")

  /** S3/S6: binary image source — Spark's binaryFile format gives
    * (path, modificationTime, length, content). Column pruning matters:
    * selecting only `path`/`length` must not read bytes (SURVEY §4).
    */
  def binaryImages(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
}
