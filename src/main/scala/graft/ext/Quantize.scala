package graft.ext

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression: symmetric per-vector int8 scalar quantization
  * (the storage format most large-scale vector pipelines ship before
  * anything fancier — 4× smaller than float32, decode is one multiply).
  * Complements [[SimilaritySearch.pqTopK]]'s product quantization: SQ8
  * preserves per-element values (good recall, 4×), PQ collapses
  * sub-vectors to code ids (32×, coarser).
  *
  * 100 TB plan: the whole computation is a MAP-ONLY pass — per-row
  * state is one max + one rescale over a 64-element array, no shuffle,
  * no aggregate, no driver state; it pipelines into whatever scan or
  * write surrounds it and scales embarrassingly. All arithmetic is
  * IEEE-exact and sequential-fold identical to the DuckDB oracle
  * (same construction as [[graft.functions.VectorFunctions]]): max is
  * exact, scale = maxabs/127 is one division, codes use the portable
  * floor(x/scale + 0.5) rounding (round() tie-breaking differs between
  * engines), and the reconstruction error uses the dot-product identity
  * ‖v − s·c‖² = v·v − 2s(v·c) + s²(c·c) so every float matches the
  * oracle bit-for-bit with no rounding slack.
  */
object Quantize {

  /** Per-vector int8 quantization report: (vec_id, scale, code_l1,
    * err2, cos_rr) where `code_l1` is the L1 checksum of the int8 code
    * vector (order-independent integer — a hashable proxy for the code
    * array itself), `err2` the squared reconstruction error and
    * `cos_rr` the cosine between the vector and its reconstruction
    * (scale-invariant, so it measures pure quantization distortion). */
  def int8Report(embeddings: DataFrame): DataFrame = {
    val v = transform(col("embedding"), _.cast("double"))
    embeddings
      .select(col("vec_id"), v.as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / lit(127.0))
      // codes kept as doubles (integral-valued) so the dot-product
      // identity below runs in the same type on both engines; the int8
      // cast is a presentation detail of the storage format
      .withColumn("cd", transform(col("v"),
        x => when(col("scale") =!= 0, floor(x / col("scale") + lit(0.5)))
          .otherwise(lit(0.0))))
      .select(
        col("vec_id"),
        col("scale"),
        aggregate(col("cd"), lit(0L), (acc, x) => acc + abs(x).cast("long"))
          .as("code_l1"),
        (dot(col("v"), col("v"))
          - lit(2.0) * col("scale") * dot(col("v"), col("cd"))
          + col("scale") * col("scale") * dot(col("cd"), col("cd"))).as("err2"),
        cosine(col("v"), col("cd")).as("cos_rr"))
  }
}
