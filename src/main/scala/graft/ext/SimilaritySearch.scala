package graft.ext

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (BASELINE.json north star). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k, broadcast queries ×
  *    full corpus scan. The 100 TB pattern: the corpus never shuffles —
  *    each partition scores its local rows against the broadcast query
  *    set and emits only per-partition top-k candidates, which the final
  *    window reduces. Correct baseline for recall evaluation.
  *
  *  - [[ivfTopK]]: IVF-style coarse quantization. Corpus vectors are
  *    assigned to their nearest centroid cell once (a write-time step in
  *    production); queries probe only the nProbe nearest cells. Turns
  *    O(|corpus|) work per query into O(|corpus| × nProbe / nCells).
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, sim), k rows per query,
    * deterministic tie-break on neighbor id. Self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosine(col("q_emb"), col("c_emb")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
              col("rk").cast("long").as("rk"))
  }

  /** Embedding-cosine near-duplicate pairs within a block (e.g. label or
    * LSH bucket): pairs with cosine ≥ threshold. */
  def nearDupPairs(corpus: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col(blockCol).as("block"),
                          col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("id_b"), col(blockCol).as("block"),
                          col("embedding").as("eb"))
    a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("ea"), col("eb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** IVF top-k: centroids = the embeddings of `centroidIds` (a
    * deterministic coarse codebook — production would k-means these;
    * any fixed, reproducible set works for the index structure).
    * Every corpus vector is assigned to its single nearest centroid;
    * each query probes the `nProbe` nearest cells and ranks only those
    * cells' members. Output shape matches bruteForceTopK (recall < 1
    * by construction). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroidIds: Seq[Long],
              nProbe: Int, k: Int): DataFrame = {
    val cents = corpus.filter(col("vec_id").isInCollection(centroidIds))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    // cell assignment: nearest centroid per corpus vector (one pass)
    val assignW = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cent_id"))
    val assigned = corpus.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
              cosine(col("embedding"), col("cent_emb")).as("csim"))
      .withColumn("rk", row_number().over(assignW)).filter(col("rk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
              col("cent_id").as("cell"))
    // query → nProbe cells
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cent_id"))
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("q_emb"), col("cent_id"),
              cosine(col("q_emb"), col("cent_emb")).as("csim"))
      .withColumn("rk", row_number().over(probeW)).filter(col("rk") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cent_id").as("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosine(col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
              col("rk").cast("long").as("rk"))
  }
}
