// Hosted under org.apache.spark.sql.* because native Expression authoring
// needs private[sql] extension points (AbstractDataType/TypeCollection and
// the Column↔Expression bridge) — the conventional packaging for Spark
// extension libraries shipping codegen expressions.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Element-wise mean of an embedding column as ONE aggregate pass: the
  * buffer is `[count, sum_0 … sum_{dim-1}]`, so a per-label centroid
  * shuffles one (dim+1)-double buffer per (label × partition) instead of
  * posexplode'ing every vector into dim rows, aggregating (label, dim)
  * pairs, and re-packing with a collect_list sort — two shuffles of
  * n×dim rows collapsed into a map-side-combined partial aggregate,
  * which is the only shape that survives a 100 TB corpus.
  *
  * Mean = sum/count per element, the same fold the posexplode+avg
  * formulation produced (accumulation order over rows is partition-
  * dependent in both — consumers round, as q52 does at 6 digits).
  *
  * The buffer adopts the first row's dimension and rejects disagreeing
  * rows loudly (a silent zip-to-shorter would corrupt the centroid).
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  override def children: Seq[Expression] = child :: Nil

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Empty sentinel: dimension adopted from the first non-null row. */
  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](n + 1) else buf
    if (b.length != n + 1)
      throw new IllegalArgumentException(
        s"vector_avg: dimension ${b.length - 1} vs $n in one group")
    val fl = elemIsFloat
    b(0) += 1.0
    var i = 0
    while (i < n) {
      b(i + 1) += (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vector_avg: merging dimensions ${a.length - 1} vs ${b.length - 1}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty || buf(0) == 0.0) return null
    val cnt = buf(0)
    val out = new Array[Double](buf.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buf(i + 1) / cnt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvg =
    copy(child = newChildren.head)

  override def prettyName: String = "vector_avg"
}

object VectorAvg {
  def column(v: Column): Column =
    ExpressionUtils.column(VectorAvg(ExpressionUtils.expression(v))
      .toAggregateExpression())
}
