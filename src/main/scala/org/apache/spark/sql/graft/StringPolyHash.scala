package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel: polynomial rolling hash h = fold(h·31 + codeunit) mod
  * 1e9+7 over the string's UTF-16 code units — bitwise-identical to the
  * `aggregate(filter(split(s, "")), pmod(acc*31 + ascii(c)))` column fold
  * it replaces (Java `split("")` yields code units; `ascii` returns the
  * unit's codepoint value; identical on ASCII, where the corpus lives).
  */
object PolyHashKernel {
  val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * 31L + str.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }
}

/** Native codegen form of the rolling string hash (text fingerprinting,
  * shingle hashing for MinHash/SimHash — SURVEY north-star text/dedup
  * ops). The interpreted split-per-character fold allocates one string
  * per character per row; this is one kernel call.
  */
case class StringPolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHashKernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = PolyHashKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$kernel.hash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StringPolyHash =
    copy(child = newChild)
}
