package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Top-k nearest codebook cells for an embedding, as a native codegen
  * Expression — the map-only IVF assignment/probe primitive
  * ([[graft.ext.SimilaritySearch.ivfTopK]]).
  *
  * Why an Expression and not composition: the per-row work is "score
  * nCells cosines, pick the k best" — nCells inlined cosine trees
  * balloon the generated method past JIT limits, and a higher-order
  * `transform` lambda drops the whole projection out of codegen
  * (HigherOrderFunction is CodegenFallback), both measured ~4× slower
  * at sf0.1. A single expression holding the codebook as a reference
  * object keeps the tight double loop inside whole-stage codegen —
  * the same preference order as [[VectorDot]] (built-in > native
  * Expression > UDF, SURVEY.md §7.3).
  *
  * Ordering matches the q24b oracle exactly: cells ranked by
  * (cosine DESC, cent_id ASC), null cosine (zero-norm input) last;
  * the dot/norm arithmetic is the identical sequential double fold as
  * [[VectorDot]], so the scores are bit-equal to DuckDB's
  * list_dot_product mirror. */
case class NearestCells(child: Expression, codebook: Array[Array[Float]],
                        ids: Array[Long], k: Int)
    extends UnaryExpression {

  require(codebook.length == ids.length && ids.nonEmpty,
    s"codebook (${codebook.length}) and ids (${ids.length}) must align and be non-empty")
  require(k >= 1 && k <= ids.length, s"k=$k out of range 1..${ids.length}")
  // iteration keeps the FIRST best on ties, so ids must ascend for the
  // (cosine DESC, cent_id ASC) oracle ordering to hold
  require(ids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "ids must be strictly ascending")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], codebook, ids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "float[][]")
    val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCells$$.MODULE$$.compute($c, $cbRef, $idsRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  /** Same sequential double fold as [[VectorDot]] — scores must be
    * bit-identical to the dot/norm composition the oracle mirrors. */
  private def dot(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def dotSelf(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * a.getFloat(i).toDouble; i += 1 }
    acc
  }
  private def dotSelf(a: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
    acc
  }

  /** Called from both interpreted eval and generated Java. */
  def compute(v: ArrayData, cb: Array[Array[Float]], ids: Array[Long],
              k: Int): GenericArrayData = {
    val n = cb.length
    val nv = math.sqrt(dotSelf(v))
    // negated cosine: ascending min-order == (cosine DESC, cent_id ASC)
    // with zero-norm (null cosine) pushed last via MaxValue
    val neg = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = cb(i)
      val denom = nv * math.sqrt(dotSelf(c))
      neg(i) = if (denom != 0.0) -(dot(v, c) / denom) else Double.MaxValue
      i += 1
    }
    // k-pass selection (k and n are codebook-sized constants, not data)
    val out = new Array[Long](k)
    val used = new Array[Boolean](n)
    var r = 0
    while (r < k) {
      var best = -1
      var j = 0
      while (j < n) {
        if (!used(j) && (best < 0 || neg(j) < neg(best))) best = j
        j += 1
      }
      used(best) = true
      out(r) = ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: the k nearest cells' ids, best first. */
  def nearest_cells(c: Column, codebook: Array[Array[Float]], ids: Array[Long],
                    k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      NearestCells(GraftColumnBridge.expression(c), codebook, ids, k))
  }
}
