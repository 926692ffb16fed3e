// Hosted under org.apache.spark.sql.* because native Expression authoring
// needs private[sql] extension points (AbstractDataType/TypeCollection and
// the Column↔Expression bridge) — the conventional packaging for Spark
// extension libraries shipping codegen expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Map-side IVF cell assignment: for one corpus vector, the ids of its
  * `k` nearest anchors by cosine, ordered (score DESC, anchor id ASC) —
  * exactly the `row_number() OVER (ORDER BY dot(v,a)/(nrm*anrm) DESC,
  * a_id)` ranking the declarative oracle uses, computed in one projection
  * over the scan instead of a crossJoin(broadcast(anchors)) + window.
  *
  * The anchor matrix rides in the expression itself (driver-held, like
  * any IVF/kmeans centroid set — a few thousand × dim floats at most) and
  * reaches generated code via `addReferenceObj`, so the corpus embedding
  * column never enters an exchange: the old crossJoin+window shape
  * shuffled corpus×n_anchors rows *carrying the arrays* just to take an
  * argmax, which at 100 TB replicates the whole corpus through a shuffle.
  *
  * Float math is bit-compatible with the oracle: the dot accumulates in
  * double in array order (the [[VectorDot]] fold), anchor elements stay
  * float until the per-element widen, and the score is `dot / (nrm *
  * anchorNrm)` — the same three ops in the same order as the SQL. Anchor
  * norms are passed in pre-computed (collected from the same Spark
  * relation the oracle mirrors), never re-derived here.
  */
case class NearestCells(
    vec: Expression,
    nrm: Expression,
    anchorIds: IndexedSeq[Long],
    anchorVecs: IndexedSeq[IndexedSeq[Float]],
    anchorNrms: IndexedSeq[Double],
    k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(anchorIds.nonEmpty, "NearestCells: empty anchor set")
  require(anchorIds.length == anchorVecs.length && anchorIds.length == anchorNrms.length)
  require(k >= 1 && k <= anchorIds.length)

  override def left: Expression = vec
  override def right: Expression = nrm

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)), DoubleType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Flattened primitive views for the hot loop (the Seq form is what
  // participates in case-class equality / plan canonicalization).
  @transient private lazy val ids: Array[Long] = anchorIds.toArray
  @transient private lazy val mats: Array[Array[Float]] = anchorVecs.map(_.toArray).toArray
  @transient private lazy val nrms: Array[Double] = anchorNrms.toArray

  /** Public so generated code can call it through the reference object. */
  def kernel(v: ArrayData, vNrm: Double): ArrayData = {
    val fl = elemIsFloat
    val nAnchors = ids.length
    // Top-k selection, ordered (score DESC, id ASC). Anchors iterate in
    // ascending-id order, so a strict > comparison on equal scores keeps
    // the earlier (smaller) id ahead — row_number tie-break semantics.
    val topIds = new Array[Long](k)
    val topScores = new Array[Double](k)
    var kept = 0
    var a = 0
    while (a < nAnchors) {
      val av = mats(a)
      val n = math.min(v.numElements(), av.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xi = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
        acc += xi * av(i).toDouble
        i += 1
      }
      val score = acc / (vNrm * nrms(a))
      // insertion position: entries strictly ahead of this anchor
      var p = 0
      while (p < kept && !(score > topScores(p))) p += 1
      if (p < k) {
        var m = math.min(kept, k - 1)
        while (m > p) {
          topIds(m) = topIds(m - 1); topScores(m) = topScores(m - 1); m -= 1
        }
        topIds(p) = ids(a); topScores(p) = score
        if (kept < k) kept += 1
      }
      a += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIds, kept))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = $ref.kernel($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(vec = newLeft, nrm = newRight)

  override def prettyName: String = "nearestcells"

  // The default toString would render the whole anchor matrix into every
  // plan string — keep plans readable (and cheap to build).
  override def toString: String =
    s"nearestcells($vec, $nrm, anchors=${anchorIds.length}, k=$k)"
}

object NearestCells {
  /** Column bridge: `anchors` as (id, vector, norm) rows collected from
    * the same relation the oracle ranks over (ids need not be sorted —
    * the kernel sorts once at construction).
    */
  def column(
      vec: Column, nrm: Column,
      anchors: Seq[(Long, Seq[Float], Double)], k: Int): Column = {
    val sorted = anchors.sortBy(_._1)
    ExpressionUtils.column(NearestCells(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(nrm),
      sorted.map(_._1).toIndexedSeq,
      sorted.map(_._2.toIndexedSeq).toIndexedSeq,
      sorted.map(_._3).toIndexedSeq, k))
  }
}
