package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q41 df-cap is the Σdf² guard for corpus scale; this pins (a) that
  * a biting cap actually drops shingles on the real corpus (the check is
  * not vacuous) and (b) that the pair set at the 0.5 threshold is
  * preserved — near-duplicate pairs are connected through rare shingles.
  */
class DedupDfCapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairSet(dfCap: Int): Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(spark, dir, dfCap)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a biting cap drops shingles on the real corpus (non-vacuous)") {
    val df = graft.sources.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    val dropped = df.filter(col("df") > 4).count()
    val maxDf = df.agg(max(col("df"))).head().getLong(0)
    info(s"shingles with df > 4: $dropped (max df = $maxDf)")
    assert(dropped > 0, "cap=4 must actually remove index entries")
    assert(maxDf < 10000, "production cap must be a structural no-op here")
  }

  test("pair set at threshold 0.5 is preserved under a biting df-cap") {
    // The cap must exceed the duplicate-CLUSTER document frequency:
    // shingles shared by a k-way duplicate cluster have df ≥ k (this
    // corpus has a 3-way cluster plus background df up to 7 — cap 3
    // loses its pairs, cap 4 preserves all 25 while dropping 151
    // shingles). At corpus scale that is the design rule: cap ≫ the
    // largest duplicate cluster you still want via exact Jaccard, with
    // q42's MinHash banding as the path for viral-scale clusters.
    val uncapped = pairSet(Int.MaxValue)
    val capped = pairSet(4)
    assert(uncapped.nonEmpty, "corpus must contain near-dup pairs")
    assert(capped == uncapped,
      s"missing: ${uncapped -- capped}; spurious: ${capped -- uncapped}")
  }
}
