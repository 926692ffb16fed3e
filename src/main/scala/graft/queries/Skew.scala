package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Skew handling as a first-class, oracled pattern (north-star scale
  * list: "skewed keys → salting or AQE skew-join").
  *
  * The fact side concentrates ~50% of lineitem on one hot key — the
  * shape that makes a plain shuffled join put half the corpus in one
  * task. The declared query runs the SALTED plan: the fact key is
  * augmented with a deterministic 16-way salt, the (tiny-per-key) dim
  * side is replicated once per salt value, and the join key becomes
  * (k, salt) — the hot key's rows spread across 16 tasks, and the
  * replication cost is |dim| × 16, not |fact| × anything. The final
  * per-key aggregate re-merges the salt split.
  *
  * The ORACLE is the plain unsalted join+aggregate — the obviously-
  * correct spec — so the driver verifies that salting is answer-
  * preserving. All arithmetic is exact in doubles (l_quantity is
  * integer-valued, the dim weight is a dyadic rational k/8), so the
  * comparison is bit-exact under ANY summation order and the check is
  * independent of how either engine schedules the partial sums.
  *
  * Honest scope note: for ALGEBRAIC aggregates over an unshuffled scan,
  * Spark's map-side partial aggregation already absorbs hot keys — the
  * pattern demonstrated here is JOIN-side salting, where partial agg
  * can't help and AQE's skew-join only rescues sort-merge joins whose
  * partitions it can split post-hoc. The SHUFFLE_MERGE hint keeps the
  * join a real shuffled join (the toy dim would otherwise broadcast and
  * dodge the skew entirely — at corpus scale the dim doesn't fit).
  */
object Skew {

  private val NumSalts = 16

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q45_salted_skew_join",
      Some(s"""
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 4 < 2 THEN 0 ELSE l_orderkey % 400 END AS k,
                 l_quantity
          FROM lineitem),
        dim AS (
          SELECT k_d, w FROM (
            SELECT o_orderkey % 400 AS k_d,
                   (o_orderkey % 8) / 8.0 AS w,
                   row_number() OVER (PARTITION BY o_orderkey % 400
                                      ORDER BY o_orderkey) AS rn
            FROM orders)
          WHERE rn <= 3)
        SELECT k, count(*) AS n, round(sum(l_quantity * w), 2) AS total
        FROM fact JOIN dim ON k = k_d
        GROUP BY k ORDER BY k"""))( (spark, dir) => {
      val fact = saltedFact(spark, dir)
      val dim = saltReplicatedDim(spark, dir)
      fact.hint("shuffle_merge")
        .join(dim, col("k") === col("k_d") && col("salt") === col("d_salt"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity") * col("w")), 2).as("total"))
        .orderBy(col("k"))
    })
  )

  /** Fact side: hot key 0 carries ~half of lineitem; the salt is a
    * deterministic hash of non-key columns, so rows of the hot key
    * spread uniformly across [0, NumSalts). Exposed for the balance
    * spec.
    */
  private[queries] def saltedFact(spark: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val li = lineitem(spark, dir)
    val k = when(pmod(col("l_orderkey"), lit(4)) < 2, lit(0L))
      .otherwise(pmod(col("l_orderkey"), lit(400)))
    li.select(k.as("k"),
      pmod(col("l_partkey") * 7 + col("l_suppkey"), lit(NumSalts)).as("salt"),
      col("l_quantity"))
  }

  /** Dim side: 3 rows per key (row_number over the unique o_orderkey, so
    * deterministic), replicated once per salt value — the |dim|×S
    * explode that makes the salted equi-join exact.
    */
  private[queries] def saltReplicatedDim(spark: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val w = Window.partitionBy(pmod(col("o_orderkey"), lit(400)))
      .orderBy(col("o_orderkey"))
    orders(spark, dir)
      .select(pmod(col("o_orderkey"), lit(400)).as("k_d"),
        (pmod(col("o_orderkey"), lit(8)) / 8.0).as("w"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3).drop("rn")
      .withColumn("d_salt", explode(typedLit((0 until NumSalts).toArray)))
  }
}
