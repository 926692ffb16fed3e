package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are derived from [[graft.queries.Registry]];
  * every operator lands there as a QueryDef with its DuckDB oracle
  * co-located so names can't drift.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The group-argmax pipeline shape (SURVEY §7 phase 1): per order, the
    * best-priced lineitem (row_number window), joined back to orders —
    * scan + window + join + filter + sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o  = spark.read.parquet(s"$dir/orders.parquet")
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("l_partkey").as("best_partkey"),
        col("l_extendedprice").as("best_price"))
      .orderBy(col("o_orderkey"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** The declared queries with NO DuckDB oracle, each with the reason no
    * hash-comparable oracle can exist and where the semantics are pinned
    * instead. Registry enforces this is exactly `queries.keySet --
    * oracleSql.keySet`; Verify dumps it as oracle_exclusions.json so the
    * driver's gate can distinguish "explicitly excluded" from
    * "unverified" (ADVICE r9 #2).
    */
  def oracleExclusions: Map[String, String] =
    graft.queries.Registry.all.flatMap(q => q.noOracleReason.map(q.name -> _)).toMap

  /** Toleranced value oracles for rows-only queries (VERDICT r11 #3):
    * name → (DuckDB SQL, per-column atol, note), resolved against sfDir
    * because an eps oracle may read a Spark-materialized input table
    * (an unresolvable table drops the entry — rows-only, never a false
    * failure). Verify dumps these as eps_oracle_sql.json; tools/check.py
    * races them with a sorted-row toleranced compare.
    */
  def epsOracles(sfDir: String): Map[String, (String, Map[String, Double], String)] =
    graft.queries.Registry.all.flatMap(q =>
      q.epsOracle.flatMap(e =>
        e.sql(sfDir).map(sql => q.name -> ((sql, e.atol, e.note))))).toMap
}
