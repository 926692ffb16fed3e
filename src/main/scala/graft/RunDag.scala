package graft

/** One-command scheduled-job entry: materialize the street-level DAG
  * end-to-end with parquet handoffs (the Dagster-loop analogue).
  *
  *   sbt "runMain graft.RunDag [sfDir] [workDir] [--no-refresh]"
  */
object RunDag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_dag"
    val refresh = !args.contains("--no-refresh")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val runs = graft.pipeline.Dag.materialize(
      spark, graft.pipeline.Dag.streetLevelDag(sfDir), workDir, refresh)
    runs.foreach(r => println(
      f"${r.name}%-12s rows=${r.rows}%8d  ${r.millis}%6d ms${if (r.skipped) "  (reused)" else ""}"))
    spark.stop()
  }
}
