// Hosted under org.apache.spark.sql.* because native Expression authoring
// needs private[sql] extension points — same packaging as VectorDot.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Allocation-free kernel for the money-grid double→decimal conversion:
  * the unscaled value of `BigDecimal(x).setScale(scale, HALF_UP)` —
  * i.e. round-half-away-from-zero of x·10^scale — computed EXACTLY from
  * the double's binary expansion in 128-bit integer arithmetic.
  *
  * Why: `cast(double AS decimal(18,s))` allocates a java BigDecimal (plus
  * MathContext rounding machinery) PER ROW; profiled at ~0.35 s per
  * cast-sum over 600k rows (sf0.1 q01 carries four). This kernel is the
  * same mathematical function — a double IS m·2^e exactly, so
  * round(x·10^s) = round(m·10^s / 2^k) for k = −e, computable with one
  * 128-bit multiply, one add, one shift — with zero allocation.
  *
  * Exactness: BigDecimal(x) is the exact binary expansion m·2^e;
  * setScale(s, HALF_UP) is floor(|m·2^e·10^s| + 1/2) with the sign
  * reapplied (HALF_UP = half away from zero). The fast path computes
  * precisely that: P = m·10^s (exact, ≤ 2^113 < 128 bits), add 2^(k−1),
  * shift right k. MoneyDecimalSpec races it against the BigDecimal
  * reference over the corpus columns and adversarial grids.
  *
  * Out-of-range (|result| ≥ 10^18, NaN, ±Inf) throws ArithmeticException
  * — the ANSI cast polarity (the gate corpora never reach it; a silent
  * null would hide corruption).
  */
object MoneyMath {
  private val Pow10: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }

  private val MaxUnscaled = Pow10(18) // decimal(18,s) bound, exclusive

  private def overflow(x: Double, scale: Int): Nothing =
    throw new ArithmeticException(
      s"$x cannot be represented as Decimal(18, $scale)")

  /** Exact-reference slow path (rare branches only). */
  private def unscaledSlow(x: Double, scale: Int): Long = {
    val u = new java.math.BigDecimal(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue()
    if (u.bitLength() > 62) overflow(x, scale)
    val v = u.longValue()
    if (math.abs(v) >= MaxUnscaled) overflow(x, scale)
    v
  }

  def unscaled(x: Double, scale: Int): Long = {
    if (x == 0.0) return 0L // covers -0.0
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) overflow(x, scale)
    val neg = x < 0.0
    val bits = java.lang.Double.doubleToLongBits(if (neg) -x else x)
    val biasedE = ((bits >>> 52) & 0x7FF).toInt
    val frac = bits & 0x000FFFFFFFFFFFFFL
    val m = if (biasedE == 0) frac else frac | (1L << 52)
    val e = (if (biasedE == 0) 1 else biasedE) - 1075
    if (e >= 0) return unscaledSlow(x, scale) // |x| ≥ 2^52: off the money grid
    val k = -e // 1..1074
    val p = Pow10(scale)
    // P = m·p exactly in 128 bits (m < 2^53, p ≤ 10^18 < 2^60 ⇒ P < 2^113).
    var lo = m * p
    var hi = Math.multiplyHigh(m, p)
    if (k > 113) return 0L // P < 2^113 ⇒ P/2^k < 2^-1 ⇒ rounds to 0
    // Add half = 2^(k-1), then floor-shift right by k (= HALF_UP on |x|).
    if (k - 1 < 64) {
      val half = 1L << (k - 1)
      val sum = lo + half
      // Unsigned carry out of the low word.
      if (java.lang.Long.compareUnsigned(sum, lo) < 0) hi += 1L
      lo = sum
    } else {
      hi += 1L << (k - 1 - 64)
    }
    val r =
      if (k < 64) {
        if ((hi >>> k) != 0L) overflow(x, scale)
        (lo >>> k) | (hi << (64 - k))
      } else if (k == 64) hi
      else hi >>> (k - 64)
    if (r < 0L || r >= MaxUnscaled) overflow(x, scale)
    if (neg) -r else r
  }

  /** Boxed Decimal construction for the expression below — compact long
    * representation, never BigDecimal. */
  def toDecimal(x: Double, scale: Int): org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(unscaled(x, scale), 18, scale)
}

/** Native codegen `cast(double AS decimal(18, scale))` on the money grid:
  * bit-identical values to the Cast it replaces (MoneyDecimalSpec), no
  * per-row BigDecimal allocation. Used by the moneySum aggregation shape
  * (q01/q05/q06/q12/q26): `sum(money_decimal(x, s))` resolves exactly
  * like `sum(cast(x as decimal(18, s)))` — same input type, same sum
  * result type decimal(28, s) — so declared-query results are unchanged.
  */
case class MoneyDecimal(child: Expression, scale: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DecimalType(18, scale)

  override protected def nullSafeEval(input: Any): Any =
    MoneyMath.toDecimal(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = MoneyMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$kernel.toDecimal($c, $scale)")
  }

  override protected def withNewChildInternal(newChild: Expression): MoneyDecimal =
    copy(child = newChild)
}
