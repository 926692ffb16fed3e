package graft.queries

/** Central list of all declared queries. SparkEntry derives its `queries`
  * and `oracleSql` maps from here so the two can never drift apart.
  */
object Registry {
  lazy val all: Seq[QueryDef] = {
    val qs = Relational.all ++ TextAnalysis.all ++ Dedup.all ++ Similarity.all ++
      Domain.all ++ DomainOracles.all ++ Streaming.all ++ Media.all ++ Temporal.all ++
      Stats.all ++ Quality.all ++ Readers.all ++ Skew.all ++ Curation.all
    val names = qs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    qs
  }

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
