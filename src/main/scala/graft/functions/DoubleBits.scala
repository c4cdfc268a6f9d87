package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Raw IEEE-754 bit pattern of a double as a long
  * (`java.lang.Double.doubleToRawLongBits`). For NON-NEGATIVE finite
  * doubles the bit pattern is ORDER-PRESERVING under signed-long
  * comparison: the sign bit is 0, and exponent-then-mantissa
  * lexicographic order IS numeric order (zeros and subnormals
  * included). That property lets a histogram bucket on a bit PREFIX
  * without a prior (min, max) pass — the serial stats → histogram
  * dependency of equal-width binning disappears; see
  * [[graft.ops.Quantiles.nonNegScalarQuantiles]]. Codegen is one
  * JVM intrinsic call, staying inside whole-stage codegen. */
case class DoubleBitsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_bits"
  // analysis-time input check (ADVICE r15): without it a non-double
  // child silently widens to double in codegen (wrong-but-quiet
  // buckets) while interpreted eval throws ClassCastException
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToRawLongBits($c)")

  override protected def withNewChildInternal(newChild: Expression): DoubleBitsExpr =
    copy(child = newChild)
}

object DoubleBits {
  /** Column wrapper; caller must pass a DoubleType column. */
  def bits(c: Column): Column =
    GraftColumnBridge.column(DoubleBitsExpr(GraftColumnBridge.expression(c)))
}
