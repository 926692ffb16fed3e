package graft.queries

/** Throwaway diagnostic (deleted after use): measured SRP ladder
  * occupancy per rung at a probe corpus.
  */
object TmpRungProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf300")
    val spark = graft.Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sigs = Similarity.srpSignatures(spark, dir)
    val n = sigs.count()
    (1 to 8).foreach { k =>
      val keys = Similarity.srpComboKeys(sigs, k)
      val combos = (0 until 8).combinations(k).size
      val (enumRows, nn) = Similarity.srpKeyEnumStats(keys, combos)
      println(s"""{"rung":$k,"enum_rows":$enumRows,"n":$nn,"per_vector":${enumRows.toDouble / math.max(nn, 1)}}""")
    }
    println(s"""{"selected_arm":${Similarity.srpSelectArm(sigs)},"n":$n}""")
    spark.stop()
  }
}
