package graft.queries

/** Central list of all declared queries. SparkEntry derives its `queries`
  * and `oracleSql` maps from here so the two can never drift apart.
  */
object Registry {
  lazy val all: Seq[QueryDef] = {
    val qs = Relational.all ++ TextAnalysis.all ++ Dedup.all ++ Similarity.all ++
      Domain.all ++ DomainOracles.all ++ Streaming.all ++ Media.all ++ Temporal.all ++
      Stats.all ++ Quality.all ++ Readers.all ++ Skew.all ++ Curation.all ++ MeshIngest.all
    val names = qs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    // Exactly one of (oracle, noOracleReason) per query: a rows-only
    // query without a declared reason would read as "unverified" in the
    // driver's gate (ADVICE r9 #2), and a reason on an oracled query
    // would be stale documentation.
    val bad = qs.filter(q => q.oracle.isDefined == q.noOracleReason.isDefined)
    require(bad.isEmpty,
      s"queries must declare oracle XOR noOracleReason: ${bad.map(_.name).mkString(",")}")
    // An eps oracle supplements a declared exclusion (toleranced value
    // verification for float-hash-poisoned queries); on an exactly-
    // oracled query it would be dead machinery.
    val badEps = qs.filter(q => q.epsOracle.isDefined && q.noOracleReason.isEmpty)
    require(badEps.isEmpty,
      s"epsOracle requires a rows-only query: ${badEps.map(_.name).mkString(",")}")
    qs
  }

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
