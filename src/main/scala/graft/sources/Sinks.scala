package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY.md §2.2 K1-K4). The reference persists through a
  * DuckDB IO manager (K1, hg/__init__.py:11-15), ad-hoc CSV dumps (K2,
  * street_level_grouping.py:131,194,228), a JSON results file (K3,
  * slg.py:82-83), and side-effecting image writes (K4, slg.py:81).
  *
  * Scale notes: all writers are parallel per-partition; `coalesce` only
  * where a single consumer file is the contract (the reference's CSVs).
  * Nested columns are stringified before CSV — pandas `to_csv` does that
  * implicitly; Spark's CSV writer rejects nested types, so the cast is
  * explicit here.
  */
object Sinks {

  /** K1: columnar table write — the engine's inter-stage persistence
    * (parquet stands in for the DuckDB table the IO manager owns).
    */
  def writeTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K2: header CSV. Nested (array/struct/map) columns are JSON-encoded
    * first, mirroring pandas' implicit str() cast.
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val flat = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType =>
          acc.withColumn(f.name, to_json(col(f.name)))
        case _ => acc
      }
    }
    val out = if (singleFile) flat.coalesce(1) else flat
    out.write.mode(SaveMode.Overwrite).option("header", true).csv(path)
  }

  /** K3: JSON-lines write (the distributed form of the reference's single
    * results.json; a downstream consumer that needs the exact nested
    * layout can re-nest with collect_list before writing).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** K4: side-effecting binary sink — one file per row from a
    * (name STRING, bytes BINARY) frame, written inside foreachPartition
    * so no bytes ever travel to the driver.
    */
  def writeBinaryFiles(df: DataFrame, dir: String): Unit = {
    val base = new java.io.File(dir)
    base.mkdirs()
    val target = base.getAbsolutePath
    df.select(col("name"), col("bytes")).foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val f = new java.io.File(target, r.getString(0))
          java.nio.file.Files.write(f.toPath, r.getAs[Array[Byte]](1))
        }
    }
  }
}
