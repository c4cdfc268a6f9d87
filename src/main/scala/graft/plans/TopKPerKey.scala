package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (the SURVEY §7.3 "(c)" path): top-k rows
  * per key under an ordering — `row_number().over(partitionBy(keys)
  * .orderBy(o)) <= k` semantics — as a first-class physical operator.
  *
  * Why a custom operator instead of the window: `WindowExec` must SORT
  * every row of each partition and materialize ALL rows before the
  * rank filter drops them. This operator keeps a bounded heap of k
  * rows per key: the map-side (partial) pass reduces each input
  * partition to ≤ k rows per key BEFORE the exchange, so the shuffle
  * moves k·|keys-per-partition| rows instead of everything — at 100 TB
  * the difference between shuffling terabytes and megabytes. The
  * reduce-side (final) pass merges the partials exactly.
  *
  * Planning: logical [[TopKPerKey]] → [[TopKStrategy]] emits
  * final(partial(child)); `EnsureRequirements` inserts the hash
  * exchange demanded by the final's ClusteredDistribution.
  */
final case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // per key: a size-bounded max-heap under the requested order —
      // the heap root is the WORST retained row, evicted when a better
      // row arrives. Memory: O(k × distinct keys in this partition).
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = rowOrd.compare(b, a)
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values.forEach(h => h.forEach(r => out += r))
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val p = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, p) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Registers the strategy once per session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** For spark.sql.extensions=... config-based injection. */
  class Extension extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit =
      e.injectPlannerStrategy(_ => TopKStrategy)
  }

  /** Top-k rows per key by `order` (ascending rank — pass desc columns
    * for largest-first). `order` must be a total order for
    * deterministic results (add a unique tiebreak column).
    *
    * Columns are resolved by piggybacking on the analyzer: a throwaway
    * `sortWithinPartitions` yields resolved catalyst SortOrders and a
    * throwaway `select` yields resolved key expressions — the Column
    * API's lazy ColumnNodeExpression wrappers never reach the physical
    * operator (they are neither resolved nor serializable). */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val spark = df.sparkSession
    install(spark)
    val sortPlan = df.sortWithinPartitions(order: _*)
      .queryExecution.analyzed.asInstanceOf[Sort]
    val keyExprs = df.select(keys: _*).queryExecution.analyzed
      .asInstanceOf[Project].projectList.map {
        case a: Alias => a.child
        case e => e
      }
    GraftColumnBridge.ofRows(spark,
      TopKPerKey(keyExprs, sortPlan.order, k, sortPlan.child))
  }
}
