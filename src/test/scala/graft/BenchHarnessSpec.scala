package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r5 "what's wrong" #2: a throwing query used to record its
  * time-to-failure and read as a FAST PASS in the bench tail. The sweep
  * now carries per-query errors into the JSON line; this spec plants a
  * failing query next to a passing one and asserts the failure is
  * visibly reported, not swallowed.
  */
class BenchHarnessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a planted failing query surfaces in the errors object, a passing one does not") {
    val planted: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "zz_planted_pass" -> ((s: SparkSession, _: String) =>
        s.range(10).selectExpr("id", "id * 2 AS twice")),
      "zz_planted_fail" -> ((s: SparkSession, _: String) =>
        s.range(10).selectExpr("assert_true(id < 5, 'boom') AS a", "id")))
    val runs = Bench.runSweep(spark, "/root/testdata/sf0.001", planted)
    val byName = runs.map(r => r.name -> r).toMap
    assert(byName("zz_planted_pass").error.isEmpty)
    assert(byName("zz_planted_fail").error.isDefined,
      "a throwing query must not read as a pass")
    val json = Bench.renderJson(runs, "/root/testdata/sf0.001", sweeps = 1)
    assert(json.contains(""""errors":{"""))
    assert(json.contains("zz_planted_fail") &&
      json.indexOf("zz_planted_fail", json.indexOf("\"errors\"")) > 0,
      s"the failing query must appear inside the errors object: $json")
    // The errors object never mentions the clean query.
    val errsPart = json.substring(json.indexOf("\"errors\""))
    assert(!errsPart.substring(0, errsPart.indexOf("}") + 1).contains("zz_planted_pass"))
    // The line must stay a SINGLE parseable JSON object for the driver —
    // exception messages can carry quotes/newlines; quoting must hold.
    assert(!json.contains("\n"))
    // With skew accumulators attached, the stats object rides along.
    val withStats = Bench.renderJson(runs, "/root/testdata/sf0.001", 1, Some((150L, 9000L, 0L)))
    assert(withStats.contains(
      """"sweep_stats":{"max_group_boxes":150,"pairs_enumerated":9000,"dense_groups":0}"""))
    assert(!withStats.contains("\n"))
  }

  test("best-of-N merge takes per-query minima and never launders a flaky failure") {
    def run(n: String, s: Double, e: Option[String]) = Bench.QueryRun(n, s, e)
    val merged = Bench.mergeSweeps(Seq(
      Seq(run("a", 5.0, None), run("b", 1.0, None),
        run("c", 0.2, Some("boom")), run("d", 0.3, Some("dead"))),
      Seq(run("a", 1.5, None), run("b", 9.0, None),
        run("c", 3.0, None), run("d", 0.4, Some("dead")))))
    assert(merged.map(r => r.name -> r.seconds) ==
      Seq("a" -> 1.5, "b" -> 1.0, "c" -> 3.0, "d" -> 0.3))
    // c: the fast time-to-FAILURE (0.2 s) must not beat the real passing
    // time; d: failed everywhere, so time-to-failure is all there is.
    assert(merged.find(_.name == "c").get.error.contains("boom"),
      "a failure in any sweep must survive the merge")
    assert(merged.find(_.name == "d").get.error.contains("dead"))
    assert(merged.filterNot(r => r.name == "c" || r.name == "d").forall(_.error.isEmpty))
  }
}
