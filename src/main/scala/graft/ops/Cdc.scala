package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture snapshot diff: given two full snapshots of the
  * same keyed table, emit the per-key change set (insert / delete /
  * update) a downstream MERGE or incremental load would apply.
  *
  * This is the batch half of CDC — the form a warehouse uses when the
  * source system only exposes periodic full dumps (the reference's
  * hourly snapshot loop, `main.py:353-359`, produces exactly such
  * dumps; diffing consecutive ones is how its append-only history
  * would become an upsert feed).
  *
  * Scale contract: ONE full-outer equi-join on the key — both sides
  * shuffle-partition on the same key, the change classification is a
  * map-side column expression over the joined row (null-safe `<=>`
  * per compared column, so NULL→value and value→NULL transitions count
  * as updates), and unchanged rows are filtered before anything
  * downstream materializes. No window, no subquery, no second pass.
  */
object Cdc {

  /** Diffs `newDf` against `oldDf` on `keys`, comparing `cols`.
    * Output: keys ++ (change_type: insert|delete|update) ++
    * old_<col>/new_<col> pairs; unchanged keys are dropped.
    * Key columns must be non-null (a null key is not an identity). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String], cols: Seq[String]): DataFrame = {
    val o = oldDf.select(
      keys.map(col) ++ cols.map(c => col(c).as(s"old_$c")) :+
        lit(true).as("_in_old"): _*)
    val n = newDf.select(
      keys.map(col) ++ cols.map(c => col(c).as(s"new_$c")) :+
        lit(true).as("_in_new"): _*)
    val changed = cols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("_in_old").isNull, lit("insert"))
          .when(col("_in_new").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        cols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
