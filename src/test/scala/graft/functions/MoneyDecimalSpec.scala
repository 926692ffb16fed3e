package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExpressions, MoneyMath}
import org.apache.spark.sql.types.DecimalType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** MoneyMath.unscaled must be BIT-IDENTICAL to the BigDecimal reference
  * (`BigDecimal(x).setScale(s, HALF_UP)` — exactly what
  * `cast(double AS decimal(18,s))` computes) on every input either path
  * accepts: the r19 moneySum optimization swaps the Cast for the kernel,
  * so any divergence is a silent oracle hash-fail.
  */
class MoneyDecimalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def reference(x: Double, scale: Int): Option[Long] = {
    val u = new java.math.BigDecimal(x).setScale(scale, RoundingMode.HALF_UP)
      .unscaledValue()
    if (u.bitLength() > 62 || math.abs(u.longValue()) >= 1000000000000000000L) None
    else Some(u.longValue())
  }

  private def check(x: Double, scale: Int): Unit = reference(x, scale) match {
    case Some(expect) =>
      assert(MoneyMath.unscaled(x, scale) == expect,
        s"x=$x scale=$scale bits=${java.lang.Double.doubleToLongBits(x)}")
    case None =>
      intercept[ArithmeticException](MoneyMath.unscaled(x, scale))
  }

  test("kernel == BigDecimal reference on adversarial grids") {
    // Exact representable half-way ties (x = (k + 0.5)/2^j shapes), signs,
    // zeros, subnormals, and the money grid itself.
    val fixed = Seq(0.0, -0.0, 2.5, -2.5, 0.5, -0.5, 0.05, 1.005, 2.675,
      1e-30, -1e-30, 4.9e-324, -4.9e-324, 1.0e12, -1.0e12, 9.99999999999e11,
      123456.785, 123456.775, 0.125, -0.125, 0.375, 1.0 / 3.0, 2.0 / 3.0)
    for (x <- fixed; s <- 0 to 6) check(x, s)
    // Dense sweep around half-way points on each scale's grid.
    for (s <- 0 to 6; k <- 0 until 2000) {
      val grid = math.pow(10.0, -s)
      val x = (k + 0.5) * grid
      check(x, s); check(-x, s)
      check(Math.nextUp(x), s); check(Math.nextDown(x), s)
    }
  }

  test("kernel == BigDecimal reference on random doubles across magnitudes") {
    val rnd = new java.util.Random(0xC0FFEE)
    var i = 0
    while (i < 2000000) {
      // Log-uniform magnitudes covering subnormal..1e17, plus raw-bits
      // patterns for exponent/mantissa corners.
      val x =
        if (i % 3 == 0) java.lang.Double.longBitsToDouble(rnd.nextLong())
        else (rnd.nextDouble() - 0.5) * math.pow(10.0, rnd.nextInt(36) - 18)
      if (java.lang.Double.isFinite(x)) check(x, i % 7)
      i += 1
    }
  }

  test("money_decimal column == cast column over the corpus (all money expressions)") {
    val dir = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exprs = Seq(
      (col("l_quantity"), 2),
      (col("l_extendedprice"), 2),
      (col("l_extendedprice") * (lit(1) - col("l_discount")), 4),
      (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6))
    exprs.foreach { case (e, s) =>
      val diff = li.select(
        GraftExpressions.moneyDecimal(e, s).as("fast"),
        e.cast(DecimalType(18, s)).as("ref"))
        .filter(col("fast") =!= col("ref") ||
          col("fast").isNull =!= col("ref").isNull)
        .count()
      assert(diff == 0L, s"scale $s diverged on $diff corpus rows")
    }
    // And the aggregated moneySum shape end-to-end.
    val a = li.agg(sum(GraftExpressions.moneyDecimal(col("l_extendedprice"), 2))
      .cast("double")).head().getDouble(0)
    val b = li.agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
      .cast("double")).head().getDouble(0)
    assert(a == b)
  }

  test("null propagates; NaN and infinity throw like the ANSI cast") {
    val df = spark.sql("SELECT CAST(NULL AS DOUBLE) AS x")
    assert(df.select(GraftExpressions.moneyDecimal(col("x"), 2)).head().isNullAt(0))
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      intercept[ArithmeticException](MoneyMath.unscaled(bad, 2))
  }
}
