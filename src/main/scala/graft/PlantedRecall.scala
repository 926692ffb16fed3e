package graft

import org.apache.spark.sql.functions.col

/** Planted-pair recall for the MinHash/SimHash dedup families at
  * beyond-oracle SFs (VERDICT r15 #3 / r16 #6 — the r16 sf10 artifact
  * was produced ad hoc; this main makes the instrument reproducible).
  *
  * The make_sf1.py corpora replicate the base corpus under per-copy
  * token suffixing that preserves WITHIN-COPY shingle Jaccard exactly
  * and zeroes cross-copy similarity, so the base corpus's exact q41
  * pairs (oracle-verified machinery) exist verbatim in every copy — a
  * known planted subset needing no exact baseline at the probe SF.
  * Eval docs (doc_id < 64) exist only in copy 0, so replicas of pairs
  * touching them are excluded from the planted set (none exist on the
  * current testdata: the sf0.1 base has no exact pair below id 64).
  *
  * Usage: runMain graft.PlantedRecall <sfDir> <baseDir> <copies> [stride]
  * Prints one JSON line per family; the round artifact wraps them.
  */
object PlantedRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val baseDir = args(1)
    val copies = args(2).toInt
    val stride = if (args.length > 3) args(3).toLong else 100000L
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairs(q: String, dir: String): Set[(Long, Long)] = {
      val s2 = spark; import s2.implicits._
      val got = SparkEntry.queries(q)(spark, dir)
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      graft.queries.Registry.byName(q).releases
        .foreach(k => graft.pipeline.SessionCache.release(spark, s"$k:$dir"))
      got
    }

    val base = pairs("q41_ngram_jaccard", baseDir)
    val planted = (0 until copies).flatMap { k =>
      if (k == 0) base
      else base.collect { case (a, b) if a >= 64 && b >= 64 =>
        (a + k * stride, b + k * stride) }
    }.toSet
    println(s"""{"base_exact_pairs":${base.size},"planted_pairs":${planted.size},"copies":$copies,"stride":$stride}""")

    Seq("q42_minhash_lsh", "q43_simhash").foreach { q =>
      val t0 = System.nanoTime()
      val got = pairs(q, sfDir)
      val secs = (System.nanoTime() - t0) / 1e9
      val rec = got.intersect(planted).size
      val recall = if (planted.isEmpty) -1.0 else rec.toDouble / planted.size
      println(s"""{"family":"$q","pairs_total":${got.size},"planted_recovered":$rec,"planted_recall":${"%.4f".format(recall)},"secs":${"%.1f".format(secs)}}""")
    }
    spark.stop()
  }
}
