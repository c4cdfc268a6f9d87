package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Skew
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch twins of the streaming operators (§2.11) — oracle-checkable
  * renderings of the same Column logic the streaming variants run. */
object StreamingParity {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q19_sessionize",
      "gap-based sessionization (30 min) via lag + conditional cumsum — batch twin of flatMapGroupsWithState",
      (s, d) => EventStreams.sessionizeBatch(Tables(s, d, "events"), 30)
        .select(col("user_id"),
                unix_micros(col("session_start")).as("session_start_us"),
                col("n_events"), col("total_value")),
      Some("""WITH g AS (SELECT user_id, event_id, ts, value, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), n AS (SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session FROM g), s AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM n) SELECT user_id, epoch_us(MIN(ts)) AS session_start_us, CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value FROM s GROUP BY user_id, session_seq""")),

    QueryDef("q19b_daily_stats",
      "streaming dailyStats batch twin: tumbling day window per event_type",
      (s, d) => EventStreams.dailyStats(Tables(s, d, "events"))
        .select(unix_micros(col("day_start")).as("day_start_us"),
                col("event_type"), col("n_events"), col("value_sum")),
      Some("""SELECT epoch_us(date_trunc('day', ts)) AS day_start_us, event_type, CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum FROM events GROUP BY 1, 2""")),

    QueryDef("q32_salted_agg",
      "skew-safe two-stage salted aggregation per event_type — result must equal the plain groupBy (oracle is unsalted)",
      (s, d) => Skew.saltedAgg(Tables(s, d, "events"), Seq(col("event_type")), 16,
          (sum(col("value").cast(DecimalType(38, 6))).as("ps"),
           sum(col("ps")).cast("double").as("value_sum")),
          (count(lit(1)).as("pn"), sum(col("pn")).cast("long").as("n"))),
      Some("""SELECT event_type, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type""")),

    QueryDef("q129_streaming_neardup_twin",
      "batch twin of the STREAMING near-dup suppressor (EventStreams.nearDupSuppressStream — the ingest-time LSH gate): per (lang, band, band-key) bucket the first-arriving doc (min doc_id here; event time on the stream) is the representative, every later bucket member emits (doc_id, band_idx, rep_id, agreement = matching fraction of the 8-hash MinHash signature). Signatures are computed IN-ROW (withMinhashSig higher-order columns — the formulation a stream evaluates statelessly; min over the in-row shingle array = MIN over exploded shingle rows, oracle-pinned); the only exchanges are the bucket-keyed min_by rep aggregate (no window sort) and the hits join on the same key. StreamingSpec proves stream ≡ this twin row-for-row, including cross-micro-batch suppression",
      (s, d) => graft.ext.Dedup.nearDupSuppressBatch(
          Tables(s, d, "documents"), "text", "doc_id", "lang", "doc_id",
          n = 3, numHashes = 8, bands = 4)
        .withColumnRenamed("id", "doc_id"),
      Some {
        val h1 = graft.functions.TextFunctions.sql.md5Half("s", 1)
        val h2 = graft.functions.TextFunctions.sql.md5Half("s", 17)
        val mhCols = (0 until 8).map(j => s"MIN($h1 + $j * $h2) AS mh$j").mkString(", ")
        val bandCase = (0 until 4).map { b =>
          s"WHEN $b THEN CAST(mh${2 * b} AS VARCHAR) || '|' || CAST(mh${2 * b + 1} AS VARCHAR)"
        }.mkString(" ")
        val agree = (0 until 8)
          .map(j => s"(CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH ${LlmOps.shingleCte},
           |mh AS (SELECT doc_id, lang, $mhCols FROM sh GROUP BY doc_id, lang),
           |bd AS (SELECT doc_id, lang, band_idx, CASE band_idx $bandCase END AS bk
           |       FROM mh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band_idx)),
           |rep AS (SELECT lang, band_idx, bk, MIN(doc_id) AS rep_id FROM bd GROUP BY 1, 2, 3),
           |hits AS (SELECT d.doc_id, d.band_idx, r.rep_id FROM bd d
           |         JOIN rep r ON r.lang = d.lang AND r.band_idx = d.band_idx AND r.bk = d.bk
           |         WHERE d.doc_id <> r.rep_id)
           |SELECT h.doc_id, CAST(h.band_idx AS INTEGER) AS band_idx, h.rep_id,
           |       CAST($agree AS DOUBLE) / CAST(8 AS DOUBLE) AS agreement
           |FROM hits h JOIN mh a ON a.doc_id = h.doc_id JOIN mh b ON b.doc_id = h.rep_id""".stripMargin.replace("\n", " ")
      })
  )
}
