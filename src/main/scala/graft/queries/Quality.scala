package graft.queries

import org.apache.spark.sql.functions._

import graft.quality.DataQuality
import graft.quality.DataQuality.{AcceptedValues, Check, InRange, NotNull}
import graft.sources.Tables._

/** Data-quality suite (north-star "data quality checks"; reference
  * analogue: the fail-closed class-map lookup, dop.py:22). The oracle SQL
  * is GENERATED from the same Check declarations the Spark side runs, so
  * the two can't drift. Notable: the lineitem PK uniqueness check FAILS
  * by design — the testdata genuinely contains duplicate
  * (l_orderkey, l_linenumber) pairs, and a quality suite that can't fire
  * isn't testing anything.
  */
object Quality {

  private val lineitemChecks: Seq[Check] = Seq(
    NotNull("l_orderkey"),
    NotNull("l_shipdate"),
    InRange("l_discount", 0.0, 0.1),
    InRange("l_quantity", 1.0, 50.0),
    AcceptedValues("l_returnflag", Seq("A", "N", "R")),
    AcceptedValues("l_linestatus", Seq("O", "F")))

  /** DuckDB violation-count expression mirroring Check.violations. */
  private def vSql(c: Check): String = c match {
    case NotNull(column, _) => s"count(*) - count($column)"
    case InRange(column, lo, hi, _) =>
      s"sum(CASE WHEN $column IS NULL OR $column < $lo OR $column > $hi THEN 1 ELSE 0 END)::BIGINT"
    case AcceptedValues(column, values, _) =>
      s"sum(CASE WHEN $column IS NULL OR $column NOT IN (${values.map(v => s"'$v'").mkString(", ")}) THEN 1 ELSE 0 END)::BIGINT"
  }

  private def checkRowSql(c: Check, table: String): String =
    s"""SELECT '${c.name}' AS "check", v AS violations, total,
          round(v::DOUBLE / total, 6) AS metric,
          (v::DOUBLE / total) <= ${c.maxRatio} AS pass
        FROM (SELECT count(*) AS total, ${vSql(c)} AS v FROM $table)"""

  private def uniqueRowSql(table: String, cols: Seq[String]): String =
    s"""SELECT 'unique:${cols.mkString(",")}' AS "check",
          (total - d)::BIGINT AS violations, total,
          round((total - d)::DOUBLE / total, 6) AS metric,
          ((total - d)::DOUBLE / total) <= 0.0 AS pass
        FROM (SELECT count(*) AS total FROM $table),
             (SELECT count(*) AS d FROM (SELECT DISTINCT ${cols.mkString(", ")} FROM $table))"""

  private def fkRowSql(name: String, child: String, childKey: String,
      parent: String, parentKey: String): String =
    s"""SELECT '$name' AS "check", v AS violations, total,
          round(v::DOUBLE / total, 6) AS metric,
          (v::DOUBLE / total) <= 0.0 AS pass
        FROM (SELECT count(*) AS total FROM $child),
             (SELECT count(*)::BIGINT AS v FROM $child c
              ANTI JOIN (SELECT DISTINCT $parentKey FROM $parent) p
                ON c.$childKey = p.$parentKey)"""

  val all: Seq[QueryDef] = Seq(

    // ── Row-local expectations over lineitem: nulls, ranges, accepted
    // values — ALL evaluated in one map-side-combined aggregate pass
    // (one scan + one 1-row shuffle for six checks).
    QueryDef(
      "q96_dq_rowchecks",
      Some(lineitemChecks.map(c => checkRowSql(c, "lineitem"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"check\"")))( (spark, dir) =>
      DataQuality.run(lineitem(spark, dir), lineitemChecks).orderBy(col("check"))),

    // ── Key-uniqueness expectations. orders.o_orderkey is a real PK
    // (passes); lineitem's nominal PK genuinely has duplicates in the
    // testdata, so that check correctly FAILS — asserting a defect the
    // data really has.
    QueryDef(
      "q97_dq_uniqueness",
      Some(Seq(
        uniqueRowSql("orders", Seq("o_orderkey")),
        uniqueRowSql("lineitem", Seq("l_orderkey", "l_linenumber")))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"check\"")))( (spark, dir) =>
      DataQuality.uniqueness(orders(spark, dir), Seq("o_orderkey"))
        .unionByName(DataQuality.uniqueness(lineitem(spark, dir),
          Seq("l_orderkey", "l_linenumber")))
        .orderBy(col("check"))),

    // ── Referential integrity: child keys must exist in the parent
    // (left join vs the distinct parent key set — broadcastable when the
    // parent is small, hash join otherwise; never a cartesian).
    QueryDef(
      "q98_dq_referential",
      Some(Seq(
        fkRowSql("fk:lineitem.l_orderkey->orders.o_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        fkRowSql("fk:orders.o_custkey->customer.c_custkey",
          "orders", "o_custkey", "customer", "c_custkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"check\"")))( (spark, dir) =>
      DataQuality.referentialIntegrity(lineitem(spark, dir), "l_orderkey",
          orders(spark, dir), "o_orderkey", "fk:lineitem.l_orderkey->orders.o_orderkey")
        .unionByName(DataQuality.referentialIntegrity(orders(spark, dir), "o_custkey",
          customer(spark, dir), "c_custkey", "fk:orders.o_custkey->customer.c_custkey"))
        .orderBy(col("check")))
  )
}
