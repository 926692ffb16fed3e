package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector/embedding primitives for the similarity-search surface
  * (north-star extension; the reference has no embedding ops — its
  * nearest analogue is the pairwise-IoU similarity matrix at
  * heritage-guard/heritage_guard/entities/bbox_grouping.py:14-23).
  *
  * All ops are pure `Column` expressions (`zip_with` + `aggregate`
  * left-folds) — codegen-friendly, no UDF boxing, and the fold order is
  * identical to the DuckDB oracle's `list_reduce`, so double-precision
  * results are bitwise comparable.
  *
  * Scale notes: dot/cosine are map-side per-row kernels. The brute-force
  * KNN shape (cross join vs a broadcast query set) is linear in corpus
  * size and embarrassingly parallel; the IVF shape prunes the corpus to
  * one cell per query before scoring. Neither shuffles the embedding
  * column itself except the final per-query top-k.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double in
    * array order (matches DuckDB list_reduce fold). Backed by the native
    * codegen [[VectorDot]] expression; the equivalent
    * `aggregate(zip_with(...))` fold is interpreted per element and ~30×
    * slower on pair-join hot paths.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; norms computed explicitly (the testdata vectors
    * are unit-norm but not bitwise-exactly so).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

/** DuckDB spellings of the same folds (same order ⇒ same doubles). */
object VectorSql {
  def dotExpr(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x,y) -> x+y)"

  def normExpr(a: String): String = s"sqrt(${dotExpr(a, a)})"

  def cosineExpr(a: String, b: String): String =
    s"(${dotExpr(a, b)} / (${normExpr(a)} * ${normExpr(b)}))"
}
