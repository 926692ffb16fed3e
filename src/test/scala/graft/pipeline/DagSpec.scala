package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class DagSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("topoSort orders by dependencies and rejects cycles") {
    val order = Dag.topoSort(Dag.streetLevelDag("/root/testdata/sf0.001")).map(_.name)
    def before(a: String, b: String) = order.indexOf(a) < order.indexOf(b)
    assert(before("detections", "grouped") && before("grouped", "rays") &&
      before("poses", "rays") && before("rays", "hits") && before("hits", "summary"))
    val cyclic = Seq(
      Dag.Stage("a", Seq("b"), (_, _) => null),
      Dag.Stage("b", Seq("a"), (_, _) => null))
    val e = intercept[IllegalArgumentException](Dag.topoSort(cyclic))
    assert(e.getMessage.contains("cycle"))
    val unknown = Seq(Dag.Stage("a", Seq("nope"), (_, _) => null))
    assert(intercept[IllegalArgumentException](
      Dag.topoSort(unknown)).getMessage.contains("unknown"))
  }

  test("street-level DAG materializes end-to-end with parquet handoffs") {
    val dir = java.nio.file.Files.createTempDirectory("dag").toString
    val runs = Dag.materialize(spark, Dag.streetLevelDag("/root/testdata/sf0.001"), dir)
    assert(runs.map(_.name) ==
      Seq("detections", "poses", "grouped", "rays", "hits", "summary"))
    assert(runs.forall(r => r.rows > 0 && !r.skipped))
    // Every stage persisted its table — the inter-job handoff.
    runs.foreach(r => assert(new java.io.File(s"$dir/${r.name}.parquet").exists()))
    // A second tick without refresh reuses everything (incremental
    // scheduling); rows still report from the persisted outputs.
    val again = Dag.materialize(spark, Dag.streetLevelDag("/root/testdata/sf0.001"),
      dir, refresh = false)
    assert(again.forall(_.skipped))
    assert(again.map(_.rows) == runs.map(_.rows))
  }
}
