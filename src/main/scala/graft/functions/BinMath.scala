package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{DecimalType, Decimal, DoubleType}

/** Exact uint256-scale `a * b / c` (reference bin math, main.py:232-233).
  *
  * The reference holds reserves/shares as Python arbitrary-precision ints,
  * so `reserveX * shares` is exact even for two uint128 values (product up
  * to ~2^256) before the true division to float. Spark's
  * `Decimal(38,0) * Decimal(38,0)` caps the result precision at 38 digits
  * and silently overflows to null for products beyond ~1e38 — so the
  * product is computed here on `java.math.BigDecimal` (unbounded), and
  * only the final quotient is rounded to double. DECIMAL128 (34
  * significant digits) on the divide leaves the double conversion with
  * ~17 digits of slack, so the result matches Python's correctly-rounded
  * `int*int/int` float in practice.
  */
object BinMath {

  /** Called from codegen via StaticInvoke; inputs are non-null
    * (propagateNull) and `c` is guarded non-zero by [[mulDivDouble]]. */
  def mulDiv(a: Decimal, b: Decimal, c: Decimal): Double =
    a.toJavaBigDecimal
      .multiply(b.toJavaBigDecimal)
      .divide(c.toJavaBigDecimal, java.math.MathContext.DECIMAL128)
      .doubleValue

  /** Column form: exact `a * b / c` as double; null when `c` = 0 or any
    * input is null (engine-wide null-on-zero division policy). */
  def mulDivDouble(a: Column, b: Column, c: Column): Column = {
    import org.apache.spark.sql.functions.when
    val dec = DecimalType(38, 0)
    val invoke = GraftColumnBridge.column(StaticInvoke(
      BinMath.getClass,
      DoubleType,
      "mulDiv",
      Seq(GraftColumnBridge.expression(a.cast(dec)),
          GraftColumnBridge.expression(b.cast(dec)),
          GraftColumnBridge.expression(c.cast(dec))),
      propagateNull = true,
      returnNullable = false))
    when(c =!= 0, invoke)
  }
}
