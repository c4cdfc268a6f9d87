package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Product-quantization encode + reconstruct as ONE map-only native
  * expression: split the embedding into m subvectors, replace each with
  * its nearest sub-codebook entry (L2², tie on centroid id), emit the
  * reconstructed vector — the ADC scoring input of
  * [[graft.ext.SimilaritySearch.pqTopK]].
  *
  * The composed form (posexplode ×m → broadcast sub-codebook join →
  * min_by groupBy → collect_list regroup) moves every code row through
  * TWO exchanges; at corpus scale the encode is a per-row pure function
  * of (embedding, codebook) and must cost zero shuffles — the same
  * argument (and the same reference-object pattern) as [[NearestCells]].
  *
  * Arithmetic is oracle-locked: d² = dot(sv,sv) − 2·dot(sv,cv) +
  * dot(cv,cv) with [[VectorDot]]'s sequential double fold and
  * left-to-right combination, argmin by (d², cent_id) — bit-identical
  * to the q24c DuckDB mirror's row_number ordering. */
case class PqReconstruct(child: Expression, codebook: Array[Array[Float]],
                         ids: Array[Long], m: Int)
    extends UnaryExpression {

  require(m > 0, s"m=$m must be positive")
  require(codebook.length == ids.length && ids.nonEmpty,
    s"codebook (${codebook.length}) and ids (${ids.length}) must align and be non-empty")
  require(ids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "ids must be strictly ascending (first-best tie keeping = min cent_id)")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override def nullSafeEval(input: Any): Any =
    PqReconstruct.compute(input.asInstanceOf[ArrayData], codebook, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqReconstruct$$.MODULE$$.compute($c, $cbRef, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)
}

object PqReconstruct {
  /** Called from interpreted eval and generated Java. The embedding's
    * dim must be divisible by m (enforced by the caller, which also
    * slices the codebook the same way). */
  def compute(v: ArrayData, cb: Array[Array[Float]], m: Int): GenericArrayData = {
    val dim = v.numElements()
    val subLen = dim / m
    val out = new Array[Float](subLen * m)
    var j = 0
    while (j < m) {
      val off = j * subLen
      // dot(sv, sv): same fold as VectorDot on the slice
      var svv = 0.0
      var i = 0
      while (i < subLen) {
        val x = v.getFloat(off + i).toDouble
        svv += x * x
        i += 1
      }
      var bestD = 0.0
      var best = -1
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var svc = 0.0
        var cvv = 0.0
        i = 0
        while (i < subLen) {
          val x = v.getFloat(off + i).toDouble
          val y = cent(off + i).toDouble
          svc += x * y
          cvv += y * y
          i += 1
        }
        // left-to-right (svv − 2·svc) + cvv — matches the column form
        val d = svv - 2.0 * svc + cvv
        // strict < keeps the FIRST (= min cent_id) on ties
        if (best < 0 || d < bestD) { bestD = d; best = c }
        c += 1
      }
      val chosen = cb(best)
      i = 0
      while (i < subLen) { out(off + i) = chosen(off + i); i += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: the PQ-reconstructed vector. `codebook` rows are FULL
    * centroid embeddings (sliced per subspace internally, so codebook
    * and input are cut identically), ids ascending. */
  def pq_reconstruct(c: Column, codebook: Array[Array[Float]], ids: Array[Long],
                     m: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      PqReconstruct(GraftColumnBridge.expression(c), codebook, ids, m))
  }
}
