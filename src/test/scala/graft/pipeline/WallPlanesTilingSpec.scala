package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The tiled margin-merge DBSCAN must reproduce the global kernel exactly
  * on the wall-plane pipeline's data: same clusters, same seed-scan
  * numbering, same borders and noise — so declaring q83 with tiles>1
  * changes the plan (multi-task clustering stage) but not one row of
  * output.
  */
class WallPlanesTilingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("tiled wallPlanes(tiles=8) == global wallPlanes(tiles=1) at sf0.01") {
    val cells = Synthetic.meshCells(spark, "/root/testdata/sf0.01")
    val global = WallPlanes.wallPlanes(cells, tiles = 1).collect()
    val tiled = WallPlanes.wallPlanes(cells, tiles = 8).collect()
    assert(global.length == tiled.length)
    global.zip(tiled).foreach { case (g, t) => assert(g == t) }
  }

  test("tiled path releases every cache it creates (no storage leak)") {
    val cells = Synthetic.meshCells(spark, "/root/testdata/sf0.01")
    // Warm run: any session-scoped caches upstream (SessionCache inputs)
    // build once here and are excluded from the delta.
    WallPlanes.wallPlanes(cells, tiles = 8).collect()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    WallPlanes.wallPlanes(cells, tiles = 8).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"tiled wallPlanes leaked persisted RDDs: $leaked")
  }

  test("many tiny tiles still merge to the global answer (stress the bridges)") {
    val cells = Synthetic.meshCells(spark, "/root/testdata/sf0.001")
    val global = WallPlanes.wallPlanes(cells, tiles = 1).collect()
    val tiled = WallPlanes.wallPlanes(cells, tiles = 64).collect()
    assert(global.length == tiled.length)
    global.zip(tiled).foreach { case (g, t) => assert(g == t) }
  }
}
