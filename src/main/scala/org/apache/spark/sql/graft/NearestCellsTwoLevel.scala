// Hosted under org.apache.spark.sql.* because native Expression authoring
// needs private[sql] extension points — see NearestCells.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** TWO-LEVEL IVF cell assignment (the "beyond the flat-K cap" path named
  * at [[graft.queries.Similarity]]'s anchorKFor): route each corpus
  * vector through a coarse quantizer first — nearest of the Kc coarse
  * anchors — then to its nearest FINE anchor among only that coarse
  * cell's fine anchors. Per-row cost drops from O(K·dim) flat to
  * O((Kc + K/Kc)·dim) ≈ O(2√K·dim): at the 65536-anchor cap that is
  * 512 anchor dots instead of 65536 per row, which is what keeps
  * assignment a cheap map-side projection when K itself has to grow
  * past what a flat scan affords. This is the classical IVF coarse/fine
  * decomposition (an IMT/IVFADC-style routing tree of depth 2).
  *
  * Determinism & oracle mirroring: the coarse set is the first Kc fine
  * anchors by the SAME min-hash selection rank (a nested subset — no
  * second anchor family to mirror), the fine→coarse routing table is
  * computed ONCE on the driver with the exact scoring fold the kernel
  * and the SQL both use (double accumulation in array order, score =
  * dot/(nrm·anrm), ties to the lower anchor id), and both levels use
  * row_number tie-break semantics — so the declarative two-window
  * oracle computes bit-identical assignments. Like [[NearestCells]],
  * the anchor matrices ride in the expression (driver-held) and the
  * embedding column never enters an exchange.
  *
  * Note the routing is HIERARCHICAL, not flat-best: a vector's nearest
  * fine anchor overall may live under a different coarse cell — the
  * standard two-level recall trade, measured against the flat path by
  * q109 vs q51's shared oracle machinery.
  */
case class NearestCellsTwoLevel(
    vec: Expression,
    nrm: Expression,
    coarseIds: IndexedSeq[Long],
    coarseVecs: IndexedSeq[IndexedSeq[Float]],
    coarseNrms: IndexedSeq[Double],
    fineIdsByCoarse: IndexedSeq[IndexedSeq[Long]],
    fineVecsByCoarse: IndexedSeq[IndexedSeq[IndexedSeq[Float]]],
    fineNrmsByCoarse: IndexedSeq[IndexedSeq[Double]])
    extends BinaryExpression with ExpectsInputTypes {

  require(coarseIds.nonEmpty, "NearestCellsTwoLevel: empty coarse set")
  require(coarseIds.length == coarseVecs.length && coarseIds.length == coarseNrms.length)
  require(fineIdsByCoarse.length == coarseIds.length)
  require(fineIdsByCoarse.forall(_.nonEmpty),
    "level-1 routing must only see coarse cells owning >=1 fine anchor " +
      "(the column() constructor drops empty cells)")

  override def left: Expression = vec
  override def right: Expression = nrm

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)), DoubleType)

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cIds: Array[Long] = coarseIds.toArray
  @transient private lazy val cMats: Array[Array[Float]] = coarseVecs.map(_.toArray).toArray
  @transient private lazy val cNrms: Array[Double] = coarseNrms.toArray
  @transient private lazy val fIds: Array[Array[Long]] = fineIdsByCoarse.map(_.toArray).toArray
  @transient private lazy val fMats: Array[Array[Array[Float]]] =
    fineVecsByCoarse.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val fNrms: Array[Array[Double]] =
    fineNrmsByCoarse.map(_.toArray).toArray

  private def dot(v: ArrayData, fl: Boolean, av: Array[Float]): Double = {
    val n = math.min(v.numElements(), av.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
      acc += xi * av(i).toDouble
      i += 1
    }
    acc
  }

  /** Public so generated code can call it through the reference object. */
  def kernel(v: ArrayData, vNrm: Double): Long = {
    val fl = elemIsFloat
    // Level 1: nearest coarse anchor (score DESC, id ASC — arrays are
    // id-sorted, strict > keeps the earlier id on ties).
    var bestC = 0
    var bestScore = Double.NegativeInfinity
    var a = 0
    while (a < cIds.length) {
      val s = dot(v, fl, cMats(a)) / (vNrm * cNrms(a))
      if (s > bestScore) { bestScore = s; bestC = a }
      a += 1
    }
    // Level 2: nearest fine anchor within the routed coarse cell.
    val ids = fIds(bestC); val mats = fMats(bestC); val nrms = fNrms(bestC)
    var bestF = 0L
    bestScore = Double.NegativeInfinity
    var f = 0
    while (f < ids.length) {
      val s = dot(v, fl, mats(f)) / (vNrm * nrms(f))
      if (s > bestScore) { bestScore = s; bestF = ids(f) }
      f += 1
    }
    bestF
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevel", this, classOf[NearestCellsTwoLevel].getName)
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = $ref.kernel($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellsTwoLevel =
    copy(vec = newLeft, nrm = newRight)

  override def prettyName: String = "nearestcells_twolevel"

  override def toString: String =
    s"nearestcells_twolevel($vec, $nrm, coarse=${coarseIds.length}, " +
      s"fine=${fineIdsByCoarse.map(_.length).sum})"
}

object NearestCellsTwoLevel {

  /** Driver-side routing-table construction from the flat anchor list
    * (id-rank-ordered as collected — hash-rank order). The first `kc`
    * anchors double as the coarse set; every fine anchor routes to its
    * nearest coarse anchor with the same scoring fold and tie rule the
    * kernel and the SQL oracle use. Each coarse anchor routes to itself
    * (score 1 is its own maximum), so no cell is empty.
    */
  def column(
      vec: Column, nrm: Column,
      anchorsByRank: Seq[(Long, Seq[Float], Double)], kc: Int): Column = {
    require(kc >= 1 && kc <= anchorsByRank.length)
    val coarse = anchorsByRank.take(kc).sortBy(_._1)
    def score(v: Seq[Float], vn: Double, c: (Long, Seq[Float], Double)): Double = {
      var acc = 0.0
      var i = 0
      val n = math.min(v.length, c._2.length)
      while (i < n) { acc += v(i).toDouble * c._2(i).toDouble; i += 1 }
      acc / (vn * c._3)
    }
    val routed: Map[Long, Seq[(Long, Seq[Float], Double)]] =
      anchorsByRank.groupBy { f =>
        // nearest coarse: score DESC, coarse id ASC (coarse is id-sorted,
        // strict > keeps the earlier id on ties)
        var bestId = coarse.head._1
        var best = Double.NegativeInfinity
        coarse.foreach { c =>
          val s = score(f._2, f._3, c)
          if (s > best) { best = s; bestId = c._1 }
        }
        bestId
      }
    // A coarse cell owning no fine anchors cannot host any corpus row —
    // drop it from level-1 routing (degenerate only: a coarse anchor can
    // lose even ITSELF to an identical-vector twin on the id tie-break).
    // The oracle mirrors this by ranking corpus rows over exactly the
    // coarse ids present in the fine routing relation.
    val kept = coarse.filter(c => routed.contains(c._1))
    val byCoarse = kept.map(c => routed(c._1).sortBy(_._1))
    ExpressionUtils.column(NearestCellsTwoLevel(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(nrm),
      kept.map(_._1).toIndexedSeq,
      kept.map(_._2.toIndexedSeq).toIndexedSeq,
      kept.map(_._3).toIndexedSeq,
      byCoarse.map(_.map(_._1).toIndexedSeq).toIndexedSeq,
      byCoarse.map(_.map(_._2.toIndexedSeq).toIndexedSeq).toIndexedSeq,
      byCoarse.map(_.map(_._3).toIndexedSeq).toIndexedSeq))
  }
}
