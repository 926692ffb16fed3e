package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Kernel: |A ∩ B| for two SORTED string arrays via a merge walk —
  * O(n+m) UTF8String binary comparisons, zero allocation — versus
  * `array_intersect`'s per-call hash-set build on the O(n²) near-dup
  * pair join. Set semantics (equal runs counted once) match
  * `array_intersect` on distinct inputs; inputs must be `array_sort`ed
  * (binary order, the same ordering UTF8String.compareTo uses).
  */
object SortedIntersectKernel {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      // array_sort places nulls last; a null on either side means no
      // further non-null matches are possible — stop instead of NPE.
      if (x == null || y == null) return c
      val cmp = x.compareTo(y)
      if (cmp == 0) {
        c += 1
        // Skip equal runs on both sides (set semantics). The run-skip
        // must also tolerate nulls (sorted nulls are terminal): a null
        // ends the run, and the outer walk then returns on it.
        val v = x
        do i += 1 while (i < n && { val t = a.getUTF8String(i); t != null && t.compareTo(v) == 0 })
        do j += 1 while (j < m && { val t = b.getUTF8String(j); t != null && t.compareTo(v) == 0 })
      } else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** Native codegen |A ∩ B| over pre-sorted string arrays (see kernel). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = SortedIntersectKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$kernel.count($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
