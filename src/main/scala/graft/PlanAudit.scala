package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = Seq("q03_filter_project", "q05_broadcast_join", "q81_iou_pairs", "q50_knn_brute", "q60_tumbling_window", "q28_asof_join", "q29_range_join", "q66_sequence_pack", "q78_mix_sample")
    qs.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
