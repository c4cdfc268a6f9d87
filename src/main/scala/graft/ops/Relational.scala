package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators distilled from the reference pipeline
  * (SURVEY.md §2). Each is a pure DataFrame => DataFrame function so
  * Catalyst sees one declarative plan end-to-end.
  */
object Relational {

  /** A1 — latest-record selection (argmax on a composite key), KEEPING
    * ties: among rows of each group, retain every row that carries the
    * lexicographically-max combination of `ordering` columns. The
    * reference does this with two max+filter rounds over deposits
    * (main.py:130-135); `rank` (never `row_number`) preserves the
    * multi-row tie the downstream sum relies on.
    *
    * Scale note: this is a single window shuffle on `keys` — the same
    * shuffle the following groupBy would need, so AQE reuses the
    * partitioning and the argmax costs one exchange total.
    */
  def latestByKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rk", rank().over(w)).filter(col("__rk") === 1).drop("__rk")
  }

  /** P2/P6 — schema-tolerant projection + rename: keep each (source →
    * alias) pair IFF the source column exists, silently dropping absent
    * ones (main.py:81-83, 342-343). Resolution happens at plan build, so
    * the scan only reads surviving columns (column pruning is preserved).
    */
  def tolerantSelect(df: DataFrame, mapping: Seq[(String, String)]): DataFrame = {
    val have = df.columns.toSet
    df.select(mapping.collect { case (s, a) if have(s) => col(s).as(a) }: _*)
  }

  /** J3/J4 — positional (align-by-ordinal) horizontal concat, the Spark
    * rendering of `pd.concat(axis=1)` (main.py:102,252): number each side
    * by a total order and join on the ordinal. The reference only ever
    * concats 1-row frames; for the general case callers MUST supply a
    * deterministic total order. A global row_number serializes through one
    * partition — acceptable for dimension-sized inputs only (documented
    * limitation; the reference's frames are 1-row).
    */
  def zipByPosition(left: DataFrame, leftOrder: Seq[Column],
                    right: DataFrame, rightOrder: Seq[Column]): DataFrame = {
    val lw = Window.orderBy(leftOrder: _*)
    val rw = Window.orderBy(rightOrder: _*)
    val l = left.withColumn("__ord", row_number().over(lw).cast("long"))
    val r = right.withColumn("__ord", row_number().over(rw).cast("long"))
    l.join(r, Seq("__ord"), "inner").withColumnRenamed("__ord", "ord")
  }

  /** A5/E14 — deterministic string fold of per-bin rows into the
    * reference's "(id: x, y; id: x, y; …)" display blob
    * (main.py:163-170, 229-244). The pandas original preserves arrival
    * order; distributed collect_list order is nondeterministic, so we
    * sort by the struct's leading field(s) for a stable result.
    *
    * @param entries struct column whose FIRST field(s) define sort order
    * @param format  mapper struct => formatted string
    */
  def stringFold(entries: Column, format: Column => Column): Column =
    concat(lit("("),
      concat_ws("; ", transform(array_sort(collect_list(entries)), format)),
      lit(")"))
}
