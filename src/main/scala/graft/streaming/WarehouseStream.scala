package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of the warehouse plane's metric maintenance
  * (VERDICT r10 #8): the q143 incremental-aggregate fold consumed as a
  * watermarked CDC stream. The CDC feed is naturally a stream — a
  * change-data topic delivers insert/update/delete records continuously
  * — and q143's signed-contribution fold is MERGE-SAFE by construction
  * (the maintained state is an exact DECIMAL(38,6) sum; decimal addition
  * is associative/commutative), so the same column expressions
  * incrementalize under Structured Streaming with no custom state:
  * per-group state is the running (Δn, Δvalue) pair, dimension-sized
  * like the batch rollup itself.
  *
  * Contract: the feed is the GATED diff (quality gate upstream of the
  * differ, q171's order of stages), so the fold here is gate-free; the
  * quarantine audit is [[quarantinedStream]] over the pre-gate feed.
  * Late records inside the watermark simply merge (sums commute);
  * records later than the watermark are dropped by the engine — route
  * such feeds through the batch fold (q143), the standard lambda split.
  */
object WarehouseStream {

  /** Signed contributions of a CDC change feed — the SHARED expression
    * between the batch fold (q143/q228) and the stream: delete/update
    * subtract the OLD row from its OLD group, insert/update add the NEW
    * row to its NEW group. Input columns: change_type ∈
    * {insert, update, delete}, old_g/old_v, new_g/new_v. Output: one
    * (g, dn, dv) row per side, dv exact DECIMAL(38,6). */
  def signedContributions(changes: DataFrame): DataFrame = {
    val D = graft.ops.Num.D
    changes.select(explode(array(
        when(col("change_type").isin("delete", "update"),
          struct(col("old_g").as("g"), lit(-1L).as("dn"),
            (col("old_v").cast(D) * -1).as("dv"))),
        when(col("change_type").isin("insert", "update"),
          struct(col("new_g").as("g"), lit(1L).as("dn"),
            col("new_v").cast(D).as("dv"))))).as("c"))
      .filter(col("c").isNotNull)
      .select(col("c.g").as("g"), col("c.dn").as("dn"), col("c.dv").as("dv"))
  }

  /** The running per-group delta state: groupBy(g) over the signed
    * contributions. Run in Complete or Update output mode; compose the
    * maintained table as base rollup ⊕ this state (the q143 merge).
    * Exactly the batch fold's numbers at any micro-batch split — the
    * StreamingSpec contract. */
  def maintainedAggStream(changes: DataFrame, watermark: String = "1 hour"): DataFrame =
    signedContributions(changes.withWatermark("ts", watermark))
      .groupBy(col("g"))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))

  /** The DQ-gate audit as a stream: running count of records whose NEW
    * side violates `ok` (q171's quarantine counter, incrementalized).
    * Deletes carry no new side and are never quarantined. */
  def quarantinedStream(changes: DataFrame, ok: Column,
                        watermark: String = "1 hour"): DataFrame =
    changes.withWatermark("ts", watermark)
      .filter(col("change_type").isin("insert", "update") && !ok)
      .agg(count(lit(1)).as("n_quarantined"))
}
