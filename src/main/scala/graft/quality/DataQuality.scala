package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (north-star "data quality
  * checks"; the reference's nearest analogue is the fail-closed class-map
  * lookup at heritage-guard/heritage_guard/dop.py:22 — an unknown key
  * aborts the pipeline rather than passing bad rows downstream).
  *
  * Design for scale: every ROW-LOCAL check (null ratio, range, accepted
  * values) compiles to ONE conditional-count aggregate expression, and
  * [[run]] evaluates ALL of them in a single map-side-combined pass over
  * the table — one scan, one 1-row shuffle, regardless of how many checks
  * are declared. Uniqueness adds one count-distinct aggregate (its own
  * shuffle, unavoidable); referential integrity is a left-anti join that
  * broadcasts when the parent key set is small and hash-shuffles
  * otherwise — never a cartesian.
  *
  * Output contract (one row per check):
  *   (check STRING, violations BIGINT, total BIGINT, metric DOUBLE, pass BOOLEAN)
  * metric is the violation ratio (or 1 − distinct/total for uniqueness).
  */
object DataQuality {

  sealed trait Check {
    def name: String
    /** Count of violating rows as an aggregate expression. */
    def violations: Column
    /** Max tolerated violation ratio. */
    def maxRatio: Double
  }

  /** Null-ratio check: `column` must be non-null in all but maxRatio. */
  final case class NotNull(column: String, maxRatio: Double = 0.0) extends Check {
    val name = s"not_null:$column"
    def violations: Column = count(lit(1)) - count(col(column))
  }

  /** Range check over a numeric column (inclusive bounds); nulls count as
    * violations (fail-closed).
    */
  final case class InRange(column: String, lo: Double, hi: Double,
      maxRatio: Double = 0.0) extends Check {
    val name = s"in_range:$column"
    def violations: Column =
      sum(when(col(column).isNull || col(column) < lo || col(column) > hi, 1L)
        .otherwise(0L))
  }

  /** Fail-closed accepted-values check (the dop.py:22 semantics: a value
    * outside the declared domain is a defect, not a pass-through).
    */
  final case class AcceptedValues(column: String, values: Seq[String],
      maxRatio: Double = 0.0) extends Check {
    val name = s"accepted_values:$column"
    def violations: Column =
      sum(when(col(column).isNull || !col(column).isin(values: _*), 1L).otherwise(0L))
  }

  /** Run all row-local checks in one aggregate pass. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val aggs = count(lit(1)).as("_total") +:
      checks.zipWithIndex.map { case (c, i) => c.violations.cast("long").as(s"_v$i") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = checks.zipWithIndex.map { case (c, i) =>
      // Empty input: zero violations vacuously pass (ratio defined as 0).
      val v = coalesce(col(s"_v$i"), lit(0L))
      val ratio = when(col("_total") === 0L, 0.0)
        .otherwise(v.cast("double") / col("_total"))
      struct(lit(c.name).as("check"), v.as("violations"),
        col("_total").as("total"),
        round(ratio, 6).as("metric"),
        (ratio <= c.maxRatio).as("pass"))
    }
    row.select(explode(array(out: _*)).as("r")).select(col("r.*"))
  }

  /** Key-uniqueness check: violations = rows beyond one per distinct key. */
  def uniqueness(df: DataFrame, columns: Seq[String], maxRatio: Double = 0.0): DataFrame = {
    val total = count(lit(1))
    val distinctK = count_distinct(struct(columns.map(col): _*))
    val agg = df.agg(total.as("_total"), distinctK.as("_distinct"))
    val ratio = when(col("_total") === 0L, 0.0)
      .otherwise((col("_total") - col("_distinct")).cast("double") / col("_total"))
    agg.select(
      lit(s"unique:${columns.mkString(",")}").as("check"),
      (col("_total") - col("_distinct")).cast("long").as("violations"),
      col("_total").as("total"),
      round(ratio, 6).as("metric"),
      (ratio <= maxRatio).as("pass"))
  }

  /** Referential integrity: every child key must exist in the parent.
    * Lazy single plan: left join against the distinct parent key set
    * (broadcast when small), orphan = no match; null child keys are
    * orphans (fail-closed).
    */
  def referentialIntegrity(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      checkName: String, maxRatio: Double = 0.0): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("_present", lit(1))
    child.select(col(childKey))
      .join(keys, Seq(childKey), "left")
      .agg(count(lit(1)).as("_total"),
        coalesce(sum(when(col("_present").isNull, 1L).otherwise(0L)), lit(0L)).as("_orphans"))
      .select(
        lit(checkName).as("check"),
        col("_orphans").cast("long").as("violations"),
        col("_total").as("total"),
        round(when(col("_total") === 0L, 0.0)
          .otherwise(col("_orphans").cast("double") / col("_total")), 6).as("metric"),
        (when(col("_total") === 0L, 0.0)
          .otherwise(col("_orphans").cast("double") / col("_total")) <= maxRatio).as("pass"))
  }
}
