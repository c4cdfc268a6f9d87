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

  /** Deterministic epoch-based upsampling (the data-constrained recipe
    * of Muennighoff et al., "Scaling Data-Constrained Language Models"):
    * small strata repeat toward the largest stratum's size, capped at
    * `maxEpochs`. epochs(g) = min(maxEpochs, maxN / n_g); each doc
    * emits floor(e) copies plus one more iff its hash fraction is below
    * frac(e) — the same hash-Bernoulli the sampling plane uses, so the
    * replicated corpus is a pure function of the data (a rerun, or a
    * different partitioning, yields byte-identical epochs).
    *
    * Scale shape (100 TB): per-stratum counts are a |groups|-row
    * aggregate broadcast back to the corpus scan; replication is a
    * map-side explode of sequence(1, k) with k <= maxEpochs + 1 — the
    * corpus never shuffles and the blow-up is bounded by maxEpochs. */
  def epochUpsample(docs: DataFrame, groupCol: String, idCol: String,
                    maxEpochs: Double = 4.0): DataFrame = {
    val n = docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).cast("double").as("n"))
    val maxN = n.agg(max(col("n")).as("mx"))
    val e = n.crossJoin(broadcast(maxN))
      .select(col("grp"), least(lit(maxEpochs), col("mx") / col("n")).as("ep"))
    val k = floor(col("ep")).cast("int") +
      when(pmod(portableHash(col(idCol).cast("string"), 31), lit(10000))
             .cast("double") / 10000.0 < col("ep") - floor(col("ep")), 1)
        .otherwise(0)
    // every input column is preserved so downstream stages (packing,
    // shard layout) consume the replicated rows directly
    docs.join(broadcast(e), docs(groupCol) === col("grp"))
      .select(docs.columns.map(docs(_)) ++ Seq(
        k.cast("long").as("n_copies"),
        explode(sequence(lit(1L), k.cast("long"))).as("copy_no")): _*)
  }

  /** Weight-sensitive fixed-size sampling: PRIORITY SAMPLING
    * (Duffield–Lund–Thorup 2007). Each row gets priority = w / u with
    * u a hash-uniform in (0, 1]; the per-stratum sample is the k
    * largest priorities — heavier rows are proportionally more likely
    * to be kept, and the estimator over the kept set is unbiased for
    * subset sums (the published scheme's whole point). Where
    * [[deterministicSample]] keeps a fixed FRACTION uniformly, this
    * keeps a fixed COUNT weight-proportionally (e.g. "5 docs per
    * language, preferring long ones").
    *
    * Determinism: u = (portableHash(key) + 1) / 2⁶⁰ is a pure function
    * of the row key, and long→double casts plus a single division are
    * correctly rounded per IEEE 754 — identical in any engine (this is
    * why priority is w/u rather than the exponential-variate
    * formulation: libm log is not cross-engine reproducible). The
    * selection is reproducible under any partitioning, and hash-exact
    * to the DuckDB oracle.
    *
    * Scale shape: priority is a map-only derivation; the per-stratum
    * top-k runs through the bounded-heap [[graft.plans.TopK.perKey]]
    * operator (map-side k-heaps, one exchange of ≤ k rows per stratum
    * per partition — never a corpus-wide window sort). */
  def prioritySample(df: DataFrame, strataCol: String, keyCol: String,
                     weightCol: String, k: Int, seed: Int = 17): DataFrame = {
    // the output columns are part of the operator's contract (q81
    // exposes both); refuse inputs that would silently collide rather
    // than overwrite user data (round-6 advice)
    Seq("priority", "rk").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column - prioritySample appends its own; rename it first"))
    // 2^60 is a power of two, so the divisor is an EXACT double
    val u = (portableHash(col(keyCol).cast("string"), seed) + lit(1L)).cast("double") /
      lit(1152921504606846976.0)
    // null weights are excluded EXPLICITLY: a null priority would sort
    // nulls-last under Spark's desc but nulls-first under SQL DESC —
    // the one place the two engines' orderings disagree
    val base = df.filter(col(weightCol).isNotNull)
      .withColumn("priority", col(weightCol).cast("double") / u)
    val top = graft.plans.TopK.perKey(base, Seq(col(strataCol)),
      Seq(col("priority").desc, col(keyCol)), k)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("priority").desc, col(keyCol))
    top.withColumn("rk", row_number().over(w).cast("long"))
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
