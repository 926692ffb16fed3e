package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Kernel: 48-bit SimHash over shingle hashes, value-identical to the
  * boxed Seq[Long] UDF it replaces (r20, guide §4 — keep per-row
  * kernels inside codegen): same spread multiply (wrap semantics on
  * the same long math), same per-bit vote, and the UDF's EXACT null
  * edge cases — a null INPUT array hashes to 0L (the UDF's null guard),
  * and a null ELEMENT votes as h = 0 (Scala unboxes null to 0 inside
  * the UDF's foreach). Equality vs the UDF is pinned by TextDedupSpec
  * on the live corpus plus adversarial literals.
  */
object SimhashKernel {
  import graft.functions.DedupFunctions.{SimBits, SimMod, Spread}

  def hash(hs: ArrayData): Long = {
    val n = hs.numElements()
    if (n == 0) return 0L
    val counts = new Array[Int](SimBits)
    var k = 0
    while (k < n) {
      val h = if (hs.isNullAt(k)) 0L else hs.getLong(k)
      val spread = (h * Spread) % SimMod
      var j = 0
      while (j < SimBits) {
        if (((spread >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      k += 1
    }
    var out = 0L
    var j = 0
    while (j < SimBits) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Native codegen 48-bit SimHash (see kernel). Never null: a null
  * input yields 0L exactly like the UDF's null guard did.
  */
case class Simhash48(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimhashKernel.hash(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = SimhashKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L : $kernel.hash(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash48 =
    copy(child = newChild)
}

object Simhash48 {
  def column(hs: Column): Column =
    ExpressionUtils.column(Simhash48(ExpressionUtils.expression(hs)))
}
