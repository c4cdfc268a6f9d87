package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** FIFO lot matching (q180): allocate outflow quantities to inflow
  * lots oldest-first, per key.
  *
  * Everyone writes this as a sequential queue (pop lots until the
  * outflow is filled) — per-key state that no window aggregate holds.
  * The engine form is DECLARATIVE: place lots and outflows on the
  * key's shared cumulative-quantity axis (lot i occupies
  * [cum_before, cum_after) of total inflow; outflow o consumes the
  * same interval of total outflow) — then FIFO allocation is EXACTLY
  * interval overlap between the two axes, because FIFO means "the
  * j-th unit consumed is the j-th unit received". So the whole
  * operator is two per-key prefix-sum windows + one co-keyed
  * equi-join with a range post-filter; the ShardedPrefix insight
  * (prefix sums linearize sequential semantics) applied to matching.
  *
  * Determinism: quantities floor onto the 6-dp grid ONCE, every
  * cumsum / endpoint / overlap stays exact DECIMAL(38,6) until the
  * final cast. (Cross-engine trap, found by the q180 hash gate:
  * DuckDB's least/greatest silently promote DECIMAL operands to
  * DOUBLE — an oracle must write endpoint min/max as CASE
  * comparisons to stay exact.)
  *
  * Scale: two key-partitioned window passes + one co-keyed join
  * (one hash exchange each side, AQE-eligible); per-key match count
  * is ≤ n_in + n_out − 1 (FIFO intervals are consecutive on one
  * axis), so the output is linear in the corpus. The join's range
  * filter evaluates streamed per key — never a materialized per-key
  * cross product. Unbacked demand (outflows beyond total inflow)
  * simply overlaps nothing and drops out.
  *
  * Both inputs need columns (key, ts, id, qty); ties on ts order by
  * id, making the axis total. Output: (key, out_id, in_id,
  * matched_qty double, in_ts, out_ts).
  */
object Fifo {

  def matchLots(inflows: DataFrame, outflows: DataFrame,
                key: String, ts: String, id: String, qty: String): DataFrame = {
    val D6 = DecimalType(38, 6)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
      .rowsBetween(Window.unboundedPreceding, 0)
    def axis(df: DataFrame, side: String): DataFrame = {
      val q = (floor(col(qty) * lit(1e6) + lit(0.5)) / lit(1e6)).cast(D6)
      df.select(col(key), col(ts), col(id), q.as("q"))
        .withColumn("hi", sum(col("q")).over(w))
        .select(col(key), col(id).as(s"${side}_id"), col(ts).as(s"${side}_ts"),
                (col("hi") - col("q")).as(s"${side}_lo"), col("hi").as(s"${side}_hi"))
    }
    axis(inflows, "in").join(axis(outflows, "out"), Seq(key))
      .filter(col("in_lo") < col("out_hi") && col("out_lo") < col("in_hi"))
      .select(col(key), col("out_id"), col("in_id"),
        (least(col("in_hi"), col("out_hi"))
          - greatest(col("in_lo"), col("out_lo"))).cast("double")
          .as("matched_qty"),
        col("in_ts"), col("out_ts"))
  }
}
