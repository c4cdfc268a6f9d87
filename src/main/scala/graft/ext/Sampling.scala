package graft.ext

import graft.functions.TextFunctions.portableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / corpus-mixing operators.
  *
  * Training-data pipelines need REPRODUCIBLE samples (a rerun must pick
  * the same rows — `df.sample()`'s RNG does not survive re-planning or
  * partition changes). These operators derive the keep/drop decision
  * from a portable hash of a stable row key, so the sample is a pure
  * function of the data: shuffle-free, partitioning-independent, and
  * verifiable by the DuckDB oracle.
  */
object Sampling {

  /** Keep ~rate of rows, decided by hash(key) mod 10000. */
  def deterministicSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame =
    df.filter(pmod(portableHash(keyCol.cast("string"), 13), lit(10000)) <
              lit((rate * 10000).toInt))

  /** Per-stratum rates (corpus mixing): e.g. Map("en" -> 0.5, "de" -> 1.0);
    * strata absent from the map are dropped. */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
                       rates: Map[String, Double]): DataFrame = {
    val rateExpr = rates.foldLeft(lit(0)) { case (els, (stratum, r)) =>
      when(strataCol === stratum, lit((r * 10000).toInt)).otherwise(els)
    }
    df.filter(pmod(portableHash(keyCol.cast("string"), 13), lit(10000)) < rateExpr)
  }

  /** Data-constrained corpus selection: greedy per-group fill by
    * quality (desc, id tiebreak) until a fixed token budget — the
    * "best N tokens per language" step of corpus mixing. Output keeps
    * every selected doc with its running `cum_tokens`.
    *
    * The per-group sequential order is inherent to greedy selection
    * (each admit depends on the running sum); at open scale the same
    * plan runs per (group, quality-range) bucket from a first-pass
    * quality histogram, bounding any one window partition. */
  def tokenBudgetSelect(docs: DataFrame, groupCol: String, textCol: String,
                        idCol: String, budget: Long): DataFrame = {
    import graft.functions.TextFunctions.{qualityScore, tokenCount}
    val base = docs.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      tokenCount(col(textCol)).as("n_tokens"),
      qualityScore(col(textCol)).as("quality"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Per-group top-k terms by frequency (vocabulary statistics):
    * explode → count → window rank, ties broken by term for
    * determinism. One shuffle for the count, one for the rank (both on
    * bounded-cardinality keys). */
  def vocabTopK(df: DataFrame, groupCol: Column, termsCol: Column, k: Int): DataFrame = {
    val counts = df.select(groupCol.as("grp"), explode(termsCol).as("term"))
      .groupBy(col("grp"), col("term"))
      .agg(count(lit(1)).cast("long").as("n"))
    val w = Window.partitionBy(col("grp")).orderBy(col("n").desc, col("term"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
