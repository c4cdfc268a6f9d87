package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.{Quantize, SimilaritySearch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vector/embedding plane beyond ANN ranking: storage-format
  * quantization and the both-sides-large KNN join. Oracle parity rests
  * on the shared IEEE arithmetic contract (see
  * [[graft.functions.VectorFunctions]]): exact max, one division,
  * portable floor-rounding, and dot products that fold sequentially in
  * element order on both engines — no rounding slack anywhere.
  */
object VectorOps {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** DuckDB mirror of the Spark-side hyperplane bucket: the SAME float
    * components embedded as double literals (same helper as q25b). */
  private def bucketSql(dim: Int, nPlanes: Int, seed: Int): String = {
    val planes = SimilaritySearch.hyperplanes(dim, nPlanes, seed)
    planes.zipWithIndex.map { case (p, j) =>
      val arr = p.map(v => java.lang.Double.toString(v.toDouble)).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q69_quantize_int8",
      "symmetric per-vector int8 scalar quantization (SQ8, the 4x embedding storage format): scale = maxabs/127, portable floor(x/scale + 0.5) codes, L1 code checksum, squared reconstruction error via the dot-product identity, and scale-invariant cosine(v, reconstruction). Map-only — no shuffle at any scale",
      (s, d) => Quantize.int8Report(t(s, d, "embeddings")),
      Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |m AS (SELECT vec_id, v, list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0 AS scale FROM e),
        |c AS (SELECT vec_id, v, scale, list_transform(v, x -> CASE WHEN scale <> 0 THEN floor(x / scale + 0.5) ELSE 0.0 END) AS cd FROM m)
        |SELECT vec_id, scale,
        | CAST(list_aggregate(list_transform(cd, x -> CAST(abs(x) AS BIGINT)), 'sum') AS BIGINT) AS code_l1,
        | list_dot_product(v, v) - 2.0 * scale * list_dot_product(v, cd) + scale * scale * list_dot_product(cd, cd) AS err2,
        | CASE WHEN sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cd, cd)) <> 0 THEN list_dot_product(v, cd) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cd, cd))) END AS cos_rr
        |FROM c""".stripMargin.replace("\n", " "))),

    QueryDef("q70_knn_join_lsh",
      "both-sides-large KNN join: every 10th vector is a query, neighbors found only within shared hyperplane-LSH buckets (6 sign bits, seed 7) — each side shuffles once on the bucket key, top-3 per query through the bounded-heap TopKPerKey operator. The scale path when the query set cannot broadcast",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        SimilaritySearch.knnJoinLsh(
          corpus = emb, queries = emb.filter(col("vec_id") % 10 === 0),
          dim = 64, nPlanes = 6, seed = 7, k = 3)
      },
      Some {
        val b = bucketSql(dim = 64, nPlanes = 6, seed = 7)
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |b AS (SELECT vec_id, v, CAST($b AS BIGINT) AS bucket FROM e),
           |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |  CASE WHEN sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)) <> 0 THEN list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) END AS sim
           |  FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id % 10 = 0),
           |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rk FROM s WHERE sim IS NOT NULL)
           |SELECT query_id, neighbor_id, sim, rk FROM r WHERE rk <= 3""".stripMargin.replace("\n", " ")
      })
  )
}
