package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import graft.ops.Num._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second batch of LLM-corpus operators: chunking, redaction, and
  * embedding centroids. */
object LlmOps2 {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q42_chunking",
      "token-window document chunking with overlap (context-window prep): 40-token chunks, stride 30",
      (s, d) => {
        val chunkTokens = 40
        val stride = 30
        val tok = tokens(col("text"))
        // chunk starts: 1, 1+stride, … while start ≤ token count
        t(s, d, "documents").select(
            col("doc_id"),
            tok.as("tok"),
            size(tok).as("n_tok"))
          .select(col("doc_id"), col("tok"),
            posexplode(sequence(lit(1), greatest(col("n_tok") - 1, lit(1)), lit(stride))))
          .filter(col("col") <= size(col("tok")))
          .select(col("doc_id"),
            col("pos").cast("long").as("chunk_idx"),
            concat_ws(" ", slice(col("tok"), col("col"), lit(chunkTokens))).as("chunk"),
            least(size(col("tok")) - col("col") + 1, lit(chunkTokens)).cast("long").as("chunk_tokens"))
      },
      // tok mirrors TextFunctions.tokens' empty-text guard: a blank doc
      // must yield [] (no chunks), not [''] (one empty chunk)
      Some("""WITH tk AS (SELECT doc_id, (CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\s+') END) AS tok FROM documents), st AS (SELECT doc_id, tok, i AS start, CAST((i - 1) / 30 AS BIGINT) AS chunk_idx FROM tk, unnest(generate_series(1, greatest(len(tok) - 1, 1), 30)) AS u(i) WHERE i <= len(tok)) SELECT doc_id, chunk_idx, array_to_string(tok[start:start+39], ' ') AS chunk, CAST(least(len(tok) - start + 1, 40) AS BIGINT) AS chunk_tokens FROM st""")),

    QueryDef("q43_redaction",
      "pattern redaction pass (PII-style scrub): mask long digit runs and emails, count hits",
      (s, d) =>
        t(s, d, "events").select(
          col("event_id"),
          regexp_replace(
            regexp_replace(col("props"), "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>"),
            "\\d{4,}", "<NUM>").as("props_redacted"),
          (length(col("props")) - length(regexp_replace(col("props"), "\\d", ""))).cast("long")
            .as("n_digits")),
      Some("""SELECT event_id, regexp_replace(regexp_replace(props, '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'), '\d{4,}', '<NUM>', 'g') AS props_redacted, CAST(length(props) - length(regexp_replace(props, '\d', '', 'g')) AS BIGINT) AS n_digits FROM events""")),

    QueryDef("q47_bpe_tokens",
      "BPE-style pretokenizer counts: letter runs / digit runs / symbol runs (RE2-safe pattern, no lookaheads)",
      (s, d) => {
        // Column API, not expr(): the SQL literal parser would eat \s
        val pat = lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+")
        t(s, d, "documents").select(
            col("lang"),
            size(regexp_extract_all(col("text"), pat, lit(0))).cast("long").as("n_bpe"),
            tokenCount(col("text")).as("n_ws"))
          .groupBy(col("lang"))
          .agg(lsum(col("n_bpe")).as("bpe_tokens"),
               lsum(col("n_ws")).as("ws_tokens"),
               lcount(lit(1)).as("n_docs"))
      },
      Some("""SELECT lang, CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+', 0))) AS BIGINT) AS bpe_tokens, CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS ws_tokens, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang""")),

    QueryDef("q51_tfidf_keywords",
      "per-document top-3 keywords by tf × rational inverse-df weight (corpus statistics / keyword extraction), ranked through the bounded-heap TopKPerKey operator",
      (s, d) => {
        import graft.functions.TextFunctions.tokens
        // the score is DEFINED as tf × (N+1)/(df+1) — a df-monotone
        // inverse-frequency weight chosen because IEEE +,/ are
        // correctly rounded (bit-identical across engines) while libm
        // log is not. NOTE: this is not log-idf under a monotone
        // rename — ACROSS terms the rational weight grows faster with
        // rarity, so the extracted keyword set can differ from
        // classical log-tf·idf (it up-weights rare terms harder); both
        // engines compute this same definition
        val tok = t(s, d, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        val tf = tok.groupBy(col("doc_id"), col("term"))
          .agg(lcount(lit(1)).as("tf"))
        // df from the tf table (already one row per (doc, term)): a
        // cheap second aggregate, no countDistinct shuffle. The df table
        // IS the corpus vocabulary — same object q63 refuses to assume
        // broadcastable at 100 TB — so no broadcast hint here either:
        // AQE picks broadcast when the measured size allows and falls
        // back to a sort-merge join on `term` when it doesn't
        val dfreq = tf.groupBy(col("term")).agg(lcount(lit(1)).as("df"))
        val n = t(s, d, "documents").agg(lcount(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "term")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"),
            (col("tf").cast("double") *
             ((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))).as("score"))
        val top = graft.plans.TopK.perKey(scored, Seq(col("doc_id")),
          Seq(col("score").desc, col("term")), 3)
        import org.apache.spark.sql.expressions.Window
        top.withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("score").desc, col("term"))).cast("long"))
          .select(col("doc_id"), col("term"), col("tf"), col("score"), col("rk"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${graft.functions.TextFunctions.sql.tokensOf("text")}) AS term FROM documents), tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2), df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents), sc AS (SELECT doc_id, term, tf, CAST(tf AS DOUBLE) * ((n_docs + 1.0) / (df + 1.0)) AS score FROM tf JOIN df USING (term) CROSS JOIN n), r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk FROM sc) SELECT doc_id, term, tf, score, rk FROM r WHERE rk <= 3""")),

    QueryDef("q44_centroids",
      "per-label embedding centroids (element-wise exact mean — IVF codebook construction)",
      (s, d) => t(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(38, 12))).cast("double") /
              count(lit(1))).as("mean_val"))
        .select(col("label"), col("pos").cast("long").as("dim"),
                round(col("mean_val"), 9).as("mean_val")),
      // DuckDB zips parallel unnests of equal length (no WITH ORDINALITY in 1.0)
      Some("""WITH e AS (SELECT label, unnest(embedding) AS x, unnest(generate_series(1, len(embedding))) AS ord FROM embeddings) SELECT label, CAST(ord - 1 AS BIGINT) AS dim, ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9) AS mean_val FROM e GROUP BY label, ord""")),

    QueryDef("q74_quality_classifier",
      "model-based quality filtering (the fastText/FineWeb-Edu classifier stage): a deterministic linear model over the q26 feature vector, squashed by the RATIONAL sigmoid 0.5 + z/(2(1+|z|)) — same shape and range as the logistic, but built only from IEEE-exact ops (+,x,/,abs are correctly rounded per IEEE 754; libm exp is not), so scores are bit-identical across engines. Classifier inference is map-only: zero shuffles at 100 TB, and the keep decision composes directly with the curation funnel",
      (s, d) => {
        import graft.functions.TextFunctions._
        // weights are fixed model parameters (a trained classifier would
        // ship them the same way); z is evaluated STRICTLY left-to-right
        // in both engines — Catalyst does not reassociate double
        // arithmetic — so each +/x is the same correctly-rounded op
        val a = alphaRatio(col("text"))
        val sw = stopwordRatio(col("text"))
        val dg = digitRatio(col("text"))
        val al = avgTokenLen(col("text"))
        val tl = least(tokenCount(col("text")).cast("double") / lit(50.0), lit(1.0))
        val z = lit(-2.0) + lit(3.0) * a + lit(4.0) * sw - lit(6.0) * dg +
          lit(0.1) * al + lit(1.5) * tl
        val score = lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))
        t(s, d, "documents").select(
          col("doc_id"), score.as("score"),
          when(score >= 0.55, lit(1L)).otherwise(lit(0L)).as("keep"))
      },
      Some(s"""WITH ${LlmOps.textStatsCte},
         |f AS (SELECT doc_id, -2.0 + 3.0 * alpha_ratio + 4.0 * stopword_ratio - 6.0 * digit_ratio + 0.1 * avg_token_len + 1.5 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) AS z FROM q)
         |SELECT doc_id, 0.5 + z / (2.0 * (1.0 + abs(z))) AS score, CAST(CASE WHEN 0.5 + z / (2.0 * (1.0 + abs(z))) >= 0.55 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM f""".stripMargin.replace("\n", " ")))
  )
}
