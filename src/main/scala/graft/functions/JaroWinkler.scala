package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the record-linkage scorer (entity
  * resolution, catalog reconciliation) complementing q58's Levenshtein
  * tier: edit distance counts operations, Jaro-Winkler scores
  * position-windowed character agreement with a common-prefix boost,
  * the standard name-matching measure.
  *
  * Semantics are bit-identical to DuckDB's `jaro_winkler_similarity`
  * (validated exhaustively on the fixture name corpora plus the classic
  * literature pairs — martha/marhta, dixon/dicksonx, duane/dwayne):
  *  - match window = max(len)/2 − 1 (integer, floored at 0), greedy
  *    first-available matching, transpositions = ordered mismatches /2;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m)/3, all IEEE double;
  *  - Winkler boost `sim + p·0.1·(1−sim)` (prefix p ≤ 4) applied only
  *    when jaro > 0.7;
  *  - either string empty → 0.0 (DuckDB's convention, including the
  *    both-empty case).
  *
  * Operates on UTF-16 code units (= code points on the BMP; the ASCII
  * fixture names are unaffected). A scalar `doGenCode` static call, so
  * consumers stay inside whole-stage codegen — the per-pair cost IS the
  * map-side cost of a blocked linkage pass at scale.
  */
object JaroWinkler {

  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.toString, b.toString)

  private def sim(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - tr).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column API. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_native"
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler$$.MODULE$$.similarity($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
