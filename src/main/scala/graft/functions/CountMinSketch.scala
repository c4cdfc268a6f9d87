package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Count–Min sketch (Cormode & Muthukrishnan 2005) as
  * first-class engine surface: a fixed-size counting aggregate
  * ([[CmsBuildAgg]]) plus a codegen'd point-query expression
  * ([[CmsEstimate]]). Completes the sketch plane next to the Bloom
  * filter (membership), HLL (cardinality) and KLL/approx quantiles:
  * CMS answers FREQUENCY queries — "how often did this token / URL /
  * n-gram appear" — from constant state.
  *
  * Why not just `groupBy(term).count()`? At 100 TB the term table IS
  * the vocabulary — billions of keys that must shuffle to count
  * exactly. The CMS form is a single bounded-state partial aggregate:
  * each partition folds its rows into a depth×width counter matrix
  * (8·d·w bytes, map-side combine works because update is commutative
  * addition and merge is element-wise addition), the shuffle moves one
  * matrix per partition — never a key — and the merged sketch
  * broadcasts to answer any number of point queries map-only.
  * estimate(t) = min_j M[j][(h1 + j·h2) mod w] ≥ true count (never an
  * undercount; overcounts only from bucket collisions, bounded by
  * ε = e/w with probability 1 − e^{−d}).
  *
  * Hashing is the ENGINE-INDEPENDENT (h1 + j·h2) mod w double-hashed
  * family over the two portable 60-bit md5 halves — identical to the
  * Bloom/[[PortableHashExpr]] plane — so a DuckDB oracle reproduces the
  * exact counter matrix, collisions included: the approximate operator
  * is hash-checkable, not just rows-checked.
  */
object CmsFns {
  private def halves(key: UTF8String): (Long, Long) = {
    val a = PortableHashExpr.computeHalves(key)
    (a.getLong(0), a.getLong(1))
  }

  /** h1 + j·h2 stays below 2⁶³ for j ≤ 7 (each half < 2⁶⁰), so position
    * arithmetic never wraps and matches the oracle's BIGINT form. */
  def add(buf: Array[Long], key: UTF8String, width: Int, depth: Int): Unit = {
    val (h1, h2) = halves(key)
    var j = 0
    while (j < depth) {
      val pos = ((h1 + j * h2) % width).toInt
      buf(j * width + pos) += 1L
      j += 1
    }
  }

  /** Serialized layout: int width, int depth, then depth·width
    * big-endian longs — the header lets a probe verify the EXACT build
    * geometry (a byte-length check alone cannot tell 64×4 from 32×8,
    * and a same-product mismatch would silently read wrong counters
    * and even undercount). */
  def estimate(buf: Array[Byte], key: UTF8String, width: Int, depth: Int): Long = {
    require(buf.length >= 8,
      s"${buf.length}-byte value is not a CMS sketch (no geometry header)")
    val bb = java.nio.ByteBuffer.wrap(buf)
    val bw = bb.getInt(0)
    val bd = bb.getInt(4)
    require(bw == width && bd == depth && buf.length == 8 + depth * width * 8,
      s"sketch was built ${bd}x$bw (${buf.length} B), probe geometry is ${depth}x$width")
    val (h1, h2) = halves(key)
    var best = Long.MaxValue
    var j = 0
    while (j < depth) {
      val pos = ((h1 + j * h2) % width).toInt
      val off = 8 + ((j * width + pos) << 3)
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (buf(off + b) & 0xffL); b += 1 }
      if (v < best) best = v
      j += 1
    }
    best
  }

  /** Aggregate a string key column into a depth×width CMS counter
    * matrix (returned serialized: 8-byte geometry header +
    * 8·depth·width counter bytes). */
  def cmsBuild(key: Column, width: Int, depth: Int): Column =
    GraftColumnBridge.column(
      CmsBuildAgg(GraftColumnBridge.expression(key), width, depth)
        .toAggregateExpression())

  /** Point frequency estimate against a sketch built by [[cmsBuild]]
    * with the SAME (width, depth). */
  def cmsEstimate(sketch: Column, key: Column, width: Int, depth: Int): Column =
    GraftColumnBridge.column(
      CmsEstimate(GraftColumnBridge.expression(sketch),
        GraftColumnBridge.expression(key), width, depth))
}

/** Fixed-size CMS aggregate: buffer = depth×width longs, update = +1 at
  * one position per row, merge = element-wise sum — bounded-state
  * partial aggregation (the shuffle moves one matrix per partition,
  * never the keys). */
case class CmsBuildAgg(
    child: Expression, width: Int, depth: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes
  with UnaryLike[Expression] {

  // reject non-string keys at analysis time, not as a mid-job
  // ClassCastException (same contract as Spark's own sketch aggregates)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  require(width >= 2, s"width=$width: need at least 2 buckets per row")
  require(depth >= 1 && depth <= 8,
    s"depth=$depth: the double-hashed family is overflow-proof only for j <= 7")
  // bound the MATRIX, not just the depth: depth*width near 2^31 would
  // overflow the Int in createAggregationBuffer's array length (a
  // confusing mid-job NegativeArraySizeException) and in the serialized
  // form's 8 + depth*width*8 length check
  require(width.toLong * depth <= (Int.MaxValue - 8) / 8,
    s"width=$width x depth=$depth: matrix exceeds the (2^31-8)/8-element buffer bound")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmsFns.add(buffer, v.asInstanceOf[UTF8String], width, depth)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

  // layout documented on CmsFns.estimate: geometry header + counters
  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buffer.length * 8) // big-endian
    bb.putInt(width).putInt(depth)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val out = new Array[Long]((storage.length - 8) / 8)
    val bb = java.nio.ByteBuffer.wrap(storage)
    bb.position(8)
    bb.asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsBuildAgg =
    copy(child = newChild)
}

/** `cms_estimate(sketch, key)` — codegen'd point query: depth counter
  * reads + a min, no allocation beyond the md5 digest. */
case class CmsEstimate(left: Expression, right: Expression,
                       width: Int, depth: Int)
  extends BinaryExpression with ExpectsInputTypes with BinaryLike[Expression] {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, StringType)

  // same contract as CmsBuildAgg: a probe with depth > 8 would overflow
  // h1 + j*h2 to a negative position; a mismatched width reads the
  // wrong counters
  require(width >= 2, s"width=$width: need at least 2 buckets per row")
  require(depth >= 1 && depth <= 8,
    s"depth=$depth: the double-hashed family is overflow-proof only for j <= 7")
  require(width.toLong * depth <= (Int.MaxValue - 8) / 8,
    s"width=$width x depth=$depth: matrix exceeds the (2^31-8)/8-element buffer bound")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CmsFns.estimate(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String], width, depth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.CmsFns$$.MODULE$$.estimate($s, $k, $width, $depth)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
