package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Recall floors for the MinHash and SimHash dedup families (VERDICT r15
  * #3 — q53's SRP ladder got this treatment in r14/r15; these pin the
  * remaining candidate-generator families). Measured on the real sf0.01
  * corpus against q41's exact inverted-index answer (which is itself
  * oracle-checked against the O(n²) declarative spec):
  *
  *  - q42 (MinHash-LSH): verified output is a SUBSET of the exact answer
  *    by construction (banded candidates, same exact-Jaccard ≥ 0.5
  *    verify), so |q42| / |q41| is pure candidate-generation recall.
  *  - q43 (SimHash): its own predicate (hamming ≤ 6 over the 48-bit
  *    signature) is complete by pigeonhole banding — the DuckDB oracle
  *    proves THAT by equality — so the number worth pinning is SEMANTIC
  *    recall: how much of the Jaccard ≥ 0.5 truth the signature family
  *    captures at this operating point.
  *
  * Both measured 1.0 on sf0.01's 25 planted near-dup pairs (r16); the
  * floor is 0.9 so a hash-family or banding regression fails loudly
  * while legitimate corpus noise does not. The per-SF operating-point
  * numbers ride BENCH_r{N}.json's family_recall field (Bench computes
  * the same two ratios untimed after each sweep).
  */
class DedupRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairs(q: String) =
    graft.SparkEntry.queries(q)(spark, dir)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash-LSH (q42) recall vs exact n-gram Jaccard (q41): subset, floor 0.9") {
    val exact = pairs("q41_ngram_jaccard")
    val mh = pairs("q42_minhash_lsh")
    assert(exact.nonEmpty, "fixture corpus lost its planted near-dup pairs")
    assert(mh.subsetOf(exact),
      s"q42 emitted pairs outside the exact answer: ${(mh -- exact).take(3)}")
    val recall = mh.size.toDouble / exact.size
    assert(recall >= 0.9, s"MinHash candidate recall $recall < 0.9 " +
      s"(${mh.size}/${exact.size}) — hash family or banding regressed")
  }

  test("SimHash (q43) semantic recall vs exact n-gram Jaccard (q41): floor 0.9") {
    val exact = pairs("q41_ngram_jaccard")
    val sh = pairs("q43_simhash")
    val hits = (sh & exact).size
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.9, s"SimHash semantic recall $recall < 0.9 " +
      s"($hits/${exact.size}) — the 48-bit/hamming-6 operating point regressed")
  }
}
