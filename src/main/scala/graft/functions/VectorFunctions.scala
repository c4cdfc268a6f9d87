package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns
  * (FIXTURES.md `embeddings`). All arithmetic is forced to double BEFORE
  * multiply/accumulate, and `aggregate` folds sequentially in element
  * order — the exact semantics DuckDB's list_dot_product has on
  * double-cast lists, which makes cosine similarity bit-reproducible
  * against the oracle (verified empirically, see tools/check.py runs).
  *
  * These are Catalyst higher-order functions, so they stay inside
  * whole-stage codegen — no UDF/boxing on the 100 TB path.
  */
object VectorFunctions {

  /** Sequential-fold dot product in double precision — a native codegen
    * expression (see [[VectorDot]]); bit-identical to the higher-order
    * `aggregate(zip_with(...))` formulation but ~an order of magnitude
    * cheaper per row (no intermediate array, no lambda dispatch). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(VectorDot(expression(a), expression(b)))
  }

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, null on zero-norm input (guarded division,
    * same normalization as graft.ops.Num.safeDiv). */
  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d =!= 0, dot(a, b) / d)
  }
}
