// Hosted under org.apache.spark.sql.* because native Expression authoring
// needs private[sql] extension points (AbstractDataType/TypeCollection and
// the Column↔Expression bridge) — the conventional packaging for Spark
// extension libraries shipping codegen expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Sign-random-projection signature as ONE native kernel call: bit p =
  * (v · plane_p ≥ 0), packed little-endian into a long (≤ 64 planes).
  *
  * One expression computing all plane dots in a tight loop replaces the
  * previous per-plane `when(dot(...) >= 0, 1L<<p)` sum — 64 separate
  * VectorDot calls would multiply both the expression-tree size (the
  * codegen-blowup class: filter pushdown duplicating a large tree past
  * the JVM method limit → silent interpreted fallback) and the plan
  * string. Dots accumulate in double in array order, exactly the
  * [[VectorDot]] / DuckDB `list_reduce` fold, so signatures are bitwise
  * comparable with the SQL mirror.
  *
  * The vector dimension must equal the plane dimension — a shorter or
  * longer vector throws (zipping to the shorter side would silently sign
  * a truncated vector; the oracle generates planes from `len(v)` and
  * would silently diverge).
  */
case class SrpSignature(vec: Expression, planes: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.nonEmpty && planes.length <= 64, "SrpSignature: 1..64 planes")
  require(planes.forall(_.length == planes.head.length), "ragged plane matrix")

  override def child: Expression = vec

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray
  @transient private lazy val dim: Int = planes.head.length

  /** Public so generated code can call it through the reference object. */
  def kernel(v: ArrayData): Long = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"srp_signature: expected dim $dim, got ${v.numElements()}")
    val fl = elemIsFloat
    var sig = 0L
    var p = 0
    while (p < mat.length) {
      val plane = mat(p)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val xi = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
        acc += xi * plane(i)
        i += 1
      }
      if (acc >= 0.0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpSignature", this, classOf[SrpSignature].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.kernel($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(vec = newChild)

  override def prettyName: String = "srpsignature"

  // Keep the plane matrix out of plan strings.
  override def toString: String =
    s"srpsignature($vec, planes=${planes.length}x${planes.head.length})"
}

object SrpSignature {
  def column(vec: Column, planes: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(SrpSignature(
      ExpressionUtils.expression(vec),
      planes.map(_.toIndexedSeq).toIndexedSeq))
}
