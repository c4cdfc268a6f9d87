package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin-Karp rolling hash over the UTF-8
  * bytes with a fixed byte window, returning the MINIMUM hash seen — a
  * winnowing-style document fingerprint (robust to local edits, unlike
  * a whole-document hash).
  *
  * Chosen as a native `Expression` with `doGenCode` (not a UDF): the
  * per-row work is a tight byte loop, and staying inside whole-stage
  * codegen avoids the UDF's Row boxing and closure dispatch on the
  * 100 TB path — the preference order from SURVEY.md §7.3 / the build
  * brief (built-in > native Expression > UDF).
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String].getBytes, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingMinHash$$.MODULE$$.compute($c.getBytes(), $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  /** 64-bit polynomial rolling hash (base 257, natural wraparound);
    * unsigned-min over all windows. Strings shorter than the window
    * hash as one window. Called from both interpreted eval and the
    * generated Java (hence public + JVM-static-reachable). */
  def compute(bytes: Array[Byte], window: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val base = 257L
    val w = math.min(window, n)
    // base^w for removing the outgoing byte
    var basePow = 1L
    var k = 0
    while (k < w) { basePow *= base; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * base + (bytes(i) & 0xff); i += 1 }
    var min = h
    while (i < n) {
      h = h * base + (bytes(i) & 0xff) - basePow * (bytes(i - w) & 0xff)
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }

  /** Column API. */
  def rolling_min_hash(c: Column, window: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(RollingMinHash(GraftColumnBridge.expression(c), window))
  }

  /** SQL registration: rolling_min_hash(str, window). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_min_hash",
      exprs => RollingMinHash(exprs.head,
        exprs(1).eval().asInstanceOf[Int]),
      "scala_udf")
}
