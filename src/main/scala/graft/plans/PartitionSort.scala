package graft.plans

import org.apache.spark.sql.{Column, Dataset, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, UnaryNode}
import org.apache.spark.sql.execution.{SortExec, SparkPlan, SparkStrategy}

/** A within-partition sort that is legal in a STREAMING query plan.
  *
  * `Dataset.sortWithinPartitions` produces a logical [[Sort]] node, which
  * `UnsupportedOperationChecker` rejects on streaming plans outright (it
  * pattern-matches the node type; `global = false` does not exempt it —
  * probed empirically on Spark 4.1). But a non-global sort is perfectly
  * well-defined per micro-batch, and it is the key to O(1)-per-key
  * in-batch memory for the `flatMapGroupsWithState` family: sort the
  * batch by (key, time, id) BEFORE the stateful operator, and each
  * group's iterator arrives time-ordered, so the fold never buffers
  * (VERDICT r10 #2 — the hot-key micro-batch buffer).
  *
  * [[SortedWithinPartitions]] is a logical node the checker does not
  * know, planned by [[PartitionSortStrategy]] straight to [[SortExec]]
  * (`global = false`) — Spark's spillable UnsafeExternalSorter, so even
  * the sort itself is disk-backed rather than a heap buffer. Because
  * `SortExec.outputOrdering` is the requested order and the stateful
  * exec only REQUIRES ordering by the grouping key (a prefix),
  * `EnsureRequirements` inserts no re-sort above it; pairing it with an
  * explicit `repartition(numShufflePartitions, key)` below satisfies the
  * exec's `StatefulOpClusteredDistribution` too, so no exchange lands
  * between the sort and the stateful operator to scramble the order.
  * The folds still guard arrival order at runtime (fail loudly, never
  * silently wrong) in case a future Spark version re-plans this.
  */
final case class SortedWithinPartitions(order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): SortedWithinPartitions =
    copy(child = newChild)
}

object PartitionSortStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SortedWithinPartitions(order, child) =>
      SortExec(order, global = false, planLater(child)) :: Nil
    case _ => Nil
  }
}

object PartitionSort {
  /** Registers the strategy once per session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(PartitionSortStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PartitionSortStrategy

  /** For spark.sql.extensions=... config-based injection. */
  class Extension extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit =
      e.injectPlannerStrategy(_ => PartitionSortStrategy)
  }

  /** `ds.sortWithinPartitions(cols)` in a form streaming accepts. Column
    * resolution piggybacks on the analyzer via a throwaway
    * `sortWithinPartitions` (the TopK.perKey recipe): analysis runs fine
    * on streaming Datasets — only `writeStream.start()` invokes the
    * unsupported-operation check, and by then the throwaway [[Sort]] has
    * been swapped for the custom node. */
  def sorted[T](ds: Dataset[T], cols: Column*): Dataset[T] = {
    import org.apache.spark.sql.GraftColumnBridge
    val spark = ds.sparkSession
    install(spark)
    val sortPlan = ds.sortWithinPartitions(cols: _*)
      .queryExecution.analyzed.asInstanceOf[Sort]
    GraftColumnBridge.ofRows(spark,
        SortedWithinPartitions(sortPlan.order, sortPlan.child))
      .as[T](ds.encoder)
  }
}
