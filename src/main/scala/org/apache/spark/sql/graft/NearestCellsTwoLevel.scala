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
    fineNrmsByCoarse: IndexedSeq[IndexedSeq[Double]],
    ac: Int = 1,
    nf: Int = 1)
    extends BinaryExpression with ExpectsInputTypes {

  require(coarseIds.nonEmpty, "NearestCellsTwoLevel: empty coarse set")
  require(coarseIds.length == coarseVecs.length && coarseIds.length == coarseNrms.length)
  require(fineIdsByCoarse.length == coarseIds.length)
  require(ac >= 1, s"assignment coarse width ac=$ac must be >= 1")
  require(nf >= 1, s"fine multi-assignment width nf=$nf must be >= 1")
  require(fineIdsByCoarse.forall(_.nonEmpty),
    "level-1 routing must only see coarse cells owning >=1 fine anchor " +
      "(the column() constructor drops empty cells)")

  override def left: Expression = vec
  override def right: Expression = nrm

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)), DoubleType)

  /** nf = 1 keeps the scalar single-cell contract (q109's hot path —
    * no per-row array allocation); nf > 1 is MULTI-ASSIGNMENT (dial (a)
    * of the beyond-cap study, promoted into q111 in r19): the top-nf
    * fine cells across the ac-coarse union, rank-ordered.
    */
  override def dataType: DataType =
    if (nf == 1) LongType else ArrayType(LongType, containsNull = false)

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

  /** Public so generated code can call it through the reference object.
    *
    * ac = 1 is the r16 deepest-routing form (nearest coarse, then
    * nearest fine within it). ac > 1 widens LEVEL-1 ASSIGNMENT to the
    * top-ac coarse cells and picks the best fine anchor in their union
    * — the measured fix for the hierarchical misassignment that
    * dominated the two-level recall loss (sf10 grid in q109's
    * scaladoc): per-row cost grows from (Kc + K/Kc) to
    * (Kc + ac·K/Kc) dots, still ~50× under flat at the 65536 cap.
    */
  def kernel(v: ArrayData, vNrm: Double): Long = {
    val fl = elemIsFloat
    val nC = cIds.length
    // Level 1: top-ac coarse anchors (score DESC, id ASC — arrays are
    // id-sorted, strict > keeps the earlier id on ties) via repeated
    // strict-max passes (ac is small).
    val acEff = math.min(ac, nC)
    val cScores = new Array[Double](nC)
    var a = 0
    while (a < nC) { cScores(a) = dot(v, fl, cMats(a)) / (vNrm * cNrms(a)); a += 1 }
    val used = new Array[Boolean](nC)
    var bestF = 0L
    var bestScore = Double.NegativeInfinity
    // Lowest fine id scanned — the deterministic assignment when every
    // fine score is NaN (zero-norm row) and no comparison ever fires.
    var fallbackF = Long.MaxValue
    var r = 0
    while (r < acEff) {
      var bestC = -1
      var bestCs = Double.NegativeInfinity
      var i = 0
      while (i < nC) {
        if (!used(i) && cScores(i) > bestCs) { bestCs = cScores(i); bestC = i }
        i += 1
      }
      // All-NaN scores (zero-norm vector ⇒ 0/0) satisfy no strict-max
      // comparison; fall back to the first unused (= lowest-id) cell so
      // degenerate rows route deterministically instead of crashing
      // (ADVICE r17: used(-1) threw ArrayIndexOutOfBoundsException).
      if (bestC < 0) { bestC = 0; while (used(bestC)) bestC += 1 }
      used(bestC) = true
      // Level 2: best fine anchor across the union of the picked cells
      // — union ids are not globally sorted, so ties compare ids.
      val ids = fIds(bestC); val mats = fMats(bestC); val nrms = fNrms(bestC)
      var f = 0
      while (f < ids.length) {
        val s = dot(v, fl, mats(f)) / (vNrm * nrms(f))
        if (s > bestScore || (s == bestScore && ids(f) < bestF)) {
          bestScore = s; bestF = ids(f)
        }
        if (ids(f) < fallbackF) fallbackF = ids(f)
        f += 1
      }
      r += 1
    }
    if (bestScore == Double.NegativeInfinity && fallbackF != Long.MaxValue) fallbackF
    else bestF
  }

  /** nf > 1 form: the top-nf fine cells across the ac-coarse union,
    * (score DESC, id ASC), rank-ordered — exactly the probe kernel's
    * union ranking applied to ASSIGNMENT (dial (a): a row whose
    * two-level route narrowly misassigns it is still findable through
    * its runner-up cell). Shorter than nf when the union holds fewer
    * fine anchors. NaN scores (zero-norm rows) satisfy no strict-max
    * comparison → first-unused fallback, same rule as [[kernel]] and
    * the probe.
    */
  def kernelMulti(v: ArrayData, vNrm: Double): ArrayData = {
    val fl = elemIsFloat
    val nC = cIds.length
    val acEff = math.min(ac, nC)
    val cScores = new Array[Double](nC)
    var a = 0
    while (a < nC) { cScores(a) = dot(v, fl, cMats(a)) / (vNrm * cNrms(a)); a += 1 }
    val usedC = new Array[Boolean](nC)
    val pickedC = new Array[Int](acEff)
    var r = 0
    while (r < acEff) {
      var bestC = -1
      var bestCs = Double.NegativeInfinity
      var i = 0
      while (i < nC) {
        if (!usedC(i) && cScores(i) > bestCs) { bestCs = cScores(i); bestC = i }
        i += 1
      }
      if (bestC < 0) { bestC = 0; while (usedC(bestC)) bestC += 1 }
      usedC(bestC) = true; pickedC(r) = bestC; r += 1
    }
    // Level 2: rank the union of the picked cells' fine anchors — the
    // union is not id-sorted across cells, so ties compare ids.
    var nCand = 0
    r = 0
    while (r < acEff) { nCand += fIds(pickedC(r)).length; r += 1 }
    val candIds = new Array[Long](nCand)
    val candScores = new Array[Double](nCand)
    var o = 0
    r = 0
    while (r < acEff) {
      val c = pickedC(r)
      val ids = fIds(c); val mats = fMats(c); val nrms = fNrms(c)
      var f = 0
      while (f < ids.length) {
        candIds(o) = ids(f)
        candScores(o) = dot(v, fl, mats(f)) / (vNrm * nrms(f))
        o += 1; f += 1
      }
      r += 1
    }
    val nfEff = math.min(nf, nCand)
    val out = new Array[Long](nfEff)
    val usedF = new Array[Boolean](nCand)
    r = 0
    while (r < nfEff) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var i = 0
      while (i < nCand) {
        if (!usedF(i) && (candScores(i) > bestS ||
            (candScores(i) == bestS && candIds(i) < bestId))) {
          bestS = candScores(i); bestId = candIds(i); best = i
        }
        i += 1
      }
      if (best < 0) { best = 0; while (usedF(best)) best += 1 }
      usedF(best) = true; out(r) = candIds(best); r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (nf == 1) kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Double])
    else kernelMulti(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevel", this, classOf[NearestCellsTwoLevel].getName)
    val call = if (nf == 1) "kernel" else "kernelMulti"
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = $ref.$call($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellsTwoLevel =
    copy(vec = newLeft, nrm = newRight)

  override def prettyName: String = "nearestcells_twolevel"

  override def toString: String =
    s"nearestcells_twolevel($vec, $nrm, coarse=${coarseIds.length}, " +
      s"fine=${fineIdsByCoarse.map(_.length).sum})"
}

/** QUERY-side coarse multi-probe for the two-level quantizer (VERDICT
  * r16 #2 — the dial that takes q109 from its deepest-pruning point to a
  * deployable one): probe the `wc` nearest coarse cells, then rank the
  * UNION of their fine anchors and keep the best `pf` fine cells —
  * (score DESC, id ASC) at both levels, exactly the corpus-routing tie
  * rule, so the declarative two-window oracle (crnk ≤ wc, frnk ≤ pf)
  * computes bit-identical probe sets. Scan budget: pf fine cells ≈
  * pf·n/K corpus rows — the SAME budget as the scaled flat path's
  * nprobe = pf (q54), spent through the O((Kc + wc·K/Kc)·dim) two-level
  * assignment instead of a flat O(K·dim) scan. Shares the routing
  * arrays with [[NearestCellsTwoLevel]]; returns the probed fine cell
  * ids in rank order (shorter when fewer candidates exist).
  */
case class NearestCellsTwoLevelProbe(
    vec: Expression,
    nrm: Expression,
    coarseIds: IndexedSeq[Long],
    coarseVecs: IndexedSeq[IndexedSeq[Float]],
    coarseNrms: IndexedSeq[Double],
    fineIdsByCoarse: IndexedSeq[IndexedSeq[Long]],
    fineVecsByCoarse: IndexedSeq[IndexedSeq[IndexedSeq[Float]]],
    fineNrmsByCoarse: IndexedSeq[IndexedSeq[Double]],
    wc: Int,
    pf: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(coarseIds.nonEmpty, "NearestCellsTwoLevelProbe: empty coarse set")
  require(wc >= 1 && pf >= 1, s"wc=$wc pf=$pf must be >= 1")

  override def left: Expression = vec
  override def right: Expression = nrm

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)), DoubleType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
  def kernel(v: ArrayData, vNrm: Double): ArrayData = {
    val fl = elemIsFloat
    // Level 1: top-wc coarse cells by (score DESC, id ASC). Coarse
    // arrays are id-sorted, so repeated strict-max passes keep the
    // earlier id on ties — wc·Kc comparisons, wc is small (⌈√p⌉).
    val nC = cIds.length
    val cScores = new Array[Double](nC)
    var a = 0
    while (a < nC) { cScores(a) = dot(v, fl, cMats(a)) / (vNrm * cNrms(a)); a += 1 }
    val wcEff = math.min(wc, nC)
    val pickedC = new Array[Int](wcEff)
    val usedC = new Array[Boolean](nC)
    var r = 0
    while (r < wcEff) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < nC) {
        if (!usedC(i) && cScores(i) > bestS) { bestS = cScores(i); best = i }
        i += 1
      }
      // NaN fallback as in NearestCellsTwoLevel.kernel: first unused.
      if (best < 0) { best = 0; while (usedC(best)) best += 1 }
      usedC(best) = true; pickedC(r) = best; r += 1
    }
    // Level 2: rank the union of the probed cells' fine anchors by
    // (score DESC, id ASC) — the union is NOT id-sorted across cells,
    // so ties compare ids explicitly.
    var nCand = 0
    r = 0
    while (r < wcEff) { nCand += fIds(pickedC(r)).length; r += 1 }
    val candIds = new Array[Long](nCand)
    val candScores = new Array[Double](nCand)
    var o = 0
    r = 0
    while (r < wcEff) {
      val c = pickedC(r)
      val ids = fIds(c); val mats = fMats(c); val nrms = fNrms(c)
      var f = 0
      while (f < ids.length) {
        candIds(o) = ids(f)
        candScores(o) = dot(v, fl, mats(f)) / (vNrm * nrms(f))
        o += 1; f += 1
      }
      r += 1
    }
    val pfEff = math.min(pf, nCand)
    val out = new Array[Long](pfEff)
    val usedF = new Array[Boolean](nCand)
    r = 0
    while (r < pfEff) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var bestId = Long.MaxValue
      var i = 0
      while (i < nCand) {
        if (!usedF(i) && (candScores(i) > bestS ||
            (candScores(i) == bestS && candIds(i) < bestId))) {
          bestS = candScores(i); bestId = candIds(i); best = i
        }
        i += 1
      }
      // NaN fallback: first unused candidate (deterministic).
      if (best < 0) { best = 0; while (usedF(best)) best += 1 }
      usedF(best) = true; out(r) = candIds(best); r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevelProbe", this, classOf[NearestCellsTwoLevelProbe].getName)
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = $ref.kernel($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellsTwoLevelProbe =
    copy(vec = newLeft, nrm = newRight)

  override def prettyName: String = "nearestcells_twolevel_probe"

  override def toString: String =
    s"nearestcells_twolevel_probe($vec, $nrm, coarse=${coarseIds.length}, " +
      s"fine=${fineIdsByCoarse.map(_.length).sum}, wc=$wc, pf=$pf)"
}

object NearestCellsTwoLevel {

  /** Driver-side routing-table construction from the flat anchor list
    * (id-rank-ordered as collected — hash-rank order). The first `kc`
    * anchors double as the coarse set; every fine anchor routes to its
    * nearest coarse anchor with the same scoring fold and tie rule the
    * kernel and the SQL oracle use. Each coarse anchor routes to itself
    * (score 1 is its own maximum), so no cell is empty.
    */
  /** (kept coarse anchors, fine anchors grouped by kept coarse cell) —
    * shared by the corpus-assignment and query-probe constructors so
    * both sides of q109 route through one table.
    */
  private def routingTable(anchorsByRank: Seq[(Long, Seq[Float], Double)], kc: Int)
      : (Seq[(Long, Seq[Float], Double)], Seq[Seq[(Long, Seq[Float], Double)]]) = {
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
    (kept, kept.map(c => routed(c._1).sortBy(_._1)))
  }

  /** The fine→coarse routing as a persistable relation: fine anchor id →
    * kept coarse anchor id, computed by the SAME fold/tie rule as
    * [[routingTable]] (it IS routingTable, flattened). Persisted by the
    * ANN index table (VERDICT r17 #6) so a reuse tick reconstructs the
    * routing without recomputing K·Kc anchor dots.
    */
  def routeOf(anchorsByRank: Seq[(Long, Seq[Float], Double)], kc: Int): Map[Long, Long] = {
    val (kept, byCoarse) = routingTable(anchorsByRank, kc)
    kept.zip(byCoarse).flatMap { case (c, fines) => fines.map(f => f._1 -> c._1) }.toMap
  }

  /** Rebuild [[routingTable]]'s output from a persisted route map —
    * bit-identical by construction: kept = the coarse ids present as
    * route targets (id-sorted, exactly routingTable's filter), each
    * cell's fine anchors id-sorted.
    */
  private def routingFromPersisted(
      anchorsByRank: Seq[(Long, Seq[Float], Double)], route: Map[Long, Long])
      : (Seq[(Long, Seq[Float], Double)], Seq[Seq[(Long, Seq[Float], Double)]]) = {
    val byId = anchorsByRank.map(a => a._1 -> a).toMap
    val grouped = anchorsByRank.groupBy(f => route(f._1))
    val kept = grouped.keys.toSeq.sorted.map(byId)
    (kept, kept.map(c => grouped(c._1).sortBy(_._1)))
  }

  def column(
      vec: Column, nrm: Column,
      anchorsByRank: Seq[(Long, Seq[Float], Double)], kc: Int,
      ac: Int = 1, route: Option[Map[Long, Long]] = None,
      nf: Int = 1): Column = {
    val (kept, byCoarse) = route.map(routingFromPersisted(anchorsByRank, _))
      .getOrElse(routingTable(anchorsByRank, kc))
    ExpressionUtils.column(NearestCellsTwoLevel(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(nrm),
      kept.map(_._1).toIndexedSeq,
      kept.map(_._2.toIndexedSeq).toIndexedSeq,
      kept.map(_._3).toIndexedSeq,
      byCoarse.map(_.map(_._1).toIndexedSeq).toIndexedSeq,
      byCoarse.map(_.map(_._2.toIndexedSeq).toIndexedSeq).toIndexedSeq,
      byCoarse.map(_.map(_._3).toIndexedSeq).toIndexedSeq,
      ac, nf))
  }

  /** The query-side multi-probe column: the `pf` best fine cells within
    * the `wc` nearest coarse cells — same routing table as [[column]].
    */
  def probeColumn(
      vec: Column, nrm: Column,
      anchorsByRank: Seq[(Long, Seq[Float], Double)], kc: Int,
      wc: Int, pf: Int, route: Option[Map[Long, Long]] = None): Column = {
    val (kept, byCoarse) = route.map(routingFromPersisted(anchorsByRank, _))
      .getOrElse(routingTable(anchorsByRank, kc))
    ExpressionUtils.column(NearestCellsTwoLevelProbe(
      ExpressionUtils.expression(vec), ExpressionUtils.expression(nrm),
      kept.map(_._1).toIndexedSeq,
      kept.map(_._2.toIndexedSeq).toIndexedSeq,
      kept.map(_._3).toIndexedSeq,
      byCoarse.map(_.map(_._1).toIndexedSeq).toIndexedSeq,
      byCoarse.map(_.map(_._2.toIndexedSeq).toIndexedSeq).toIndexedSeq,
      byCoarse.map(_.map(_._3).toIndexedSeq).toIndexedSeq,
      wc, pf))
  }
}
