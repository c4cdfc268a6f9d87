package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values distinct sketch as a first-class AGGREGATE — the
  * merge-safe form of the [[graft.ops.KmvSketch]] TopK build, usable
  * anywhere an aggregate goes: `groupBy(...).agg(kmv_build(h, k))` in
  * batch, a watermarked windowed aggregate in Structured Streaming
  * (state = one bounded sketch per open window, the q124
  * histogram-quantile pattern applied to DISTINCT counting), and
  * `cube`/`rollup` for free.
  *
  * Buffer = the k smallest DISTINCT hash values (a bounded TreeSet);
  * update is insert-if-smaller, merge is sketch union re-capped at k —
  * commutative and associative, so map-side partial aggregation holds:
  * the shuffle moves one ≤ k-long sketch per partition per group,
  * never the members. Feed it the PORTABLE 60-bit hash
  * ([[graft.functions.TextFunctions.portableHash]]) and the emitted
  * sketch — and any estimate derived from it — is bit-reproducible in
  * the DuckDB oracle (q130), the same discipline as the CMS matrix
  * ([[CmsBuildAgg]]).
  */
object KmvFns {
  import org.apache.spark.sql.functions._

  /** Aggregate a 60-bit-hash column into the sorted array of its k
    * smallest distinct values. */
  def kmvBuild(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvBuildAgg(GraftColumnBridge.expression(hash), k).toAggregateExpression())

  /** Distinct-count estimate over a sketch array built with the same k:
    * exact when the sketch is not full; (k−1)·2⁶⁰/m_k (4-dp
    * floor-rounded) when it is. Token-for-token the oracle's estimator
    * ([[graft.ops.KmvSketch.estimateSql]]). */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(graft.ops.KmvSketch.HashSpace) /
                         element_at(sketch, k).cast("double") * 1e4 + 0.5) / 1e4)
}

/** Bounded distinct-minima aggregate: buffer = TreeSet capped at k. */
case class KmvBuildAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(LongType)

  require(k >= 1 && k <= (1 << 20), s"k=$k: need 1 <= k <= 2^20")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(storage)
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvBuildAgg =
    copy(child = newChild)
}
