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
      Some("""SELECT event_type, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type"""))
  )
}
