package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filter as first-class engine surface: a
  * fixed-size aggregate ([[BloomBuildAgg]]) plus a codegen'd membership
  * expression ([[BloomMightContain]]).
  *
  * Why not a semi-join? An incremental-dedup standing index at corpus
  * scale is billions of keys; an anti-join against it shuffles the
  * BATCH by key. The Bloom form reduces the index to a CONSTANT-SIZE
  * bitmap (mBits/8 bytes, default 16 KiB) that broadcasts to every
  * executor, so candidate filtering is map-only — only the (tiny)
  * possibly-present fraction continues to the exact verify join. Same
  * role as Spark's own runtime `bloom_filter_agg` row-level filtering,
  * but with ENGINE-INDEPENDENT hashing: bit positions are
  * (h1 + j·h2) mod m over the two portable 60-bit md5 halves
  * (Kirsch–Mitzenmacher, the same family as the MinHash plane), so a
  * DuckDB oracle can reproduce the exact position set and the exact
  * hit set — false positives included — making the approximate
  * operator hash-checkable, not just rows-checked.
  *
  * No false negatives by construction (every inserted key's bits are
  * set); expected false-positive rate ≈ (1 − e^{−k·n/m})^k.
  */
object BloomFns {
  /** Both 60-bit md5 halves of the key — shared definition with the
    * MinHash family ([[PortableHashExpr.computeHalves]]). */
  private def halves(key: UTF8String): (Long, Long) = {
    val a = PortableHashExpr.computeHalves(key)
    (a.getLong(0), a.getLong(1))
  }

  /** h1 + j·h2 stays below 2⁶³ for j ≤ 7 (each half < 2⁶⁰), so the
    * position arithmetic never wraps — and therefore matches the
    * oracle's BIGINT arithmetic, which RAISES on overflow. */
  def add(buf: Array[Byte], key: UTF8String, mBits: Int, kHashes: Int): Unit = {
    val (h1, h2) = halves(key)
    var j = 0
    while (j < kHashes) {
      val pos = ((h1 + j * h2) % mBits).toInt
      buf(pos >> 3) = (buf(pos >> 3) | (1 << (pos & 7))).toByte
      j += 1
    }
  }

  def mightContain(buf: Array[Byte], key: UTF8String, mBits: Int, kHashes: Int): Boolean = {
    val (h1, h2) = halves(key)
    var j = 0
    while (j < kHashes) {
      val pos = ((h1 + j * h2) % mBits).toInt
      if ((buf(pos >> 3) & (1 << (pos & 7))) == 0) return false
      j += 1
    }
    true
  }

  /** Aggregate a string key column into an mBits-wide Bloom bitmap. */
  def bloomBuild(key: Column, mBits: Int, kHashes: Int): Column =
    GraftColumnBridge.column(
      BloomBuildAgg(GraftColumnBridge.expression(key), mBits, kHashes)
        .toAggregateExpression())

  /** Membership probe against a bitmap built by [[bloomBuild]] with the
    * SAME (mBits, kHashes). */
  def bloomMightContain(bitmap: Column, key: Column, mBits: Int, kHashes: Int): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(bitmap),
        GraftColumnBridge.expression(key), mBits, kHashes))
}

/** Fixed-size Bloom bitmap aggregate: buffer = mBits/8 bytes, update =
  * set k bits, merge = byte-wise OR — a classic bounded-state partial
  * aggregate (map-side combine works, shuffle moves one bitmap per
  * partition, never the keys). */
case class BloomBuildAgg(
    child: Expression, mBits: Int, kHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(Integer.bitCount(mBits) == 1 && mBits >= 8,
    s"mBits=$mBits must be a power of two >= 8")
  require(kHashes >= 1 && kHashes <= 8,
    s"kHashes=$kHashes: the double-hashed family is overflow-proof only for j <= 7")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomFns.add(buffer, v.asInstanceOf[UTF8String], mBits, kHashes)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** `might_contain(bitmap, key)` — codegen'd probe, k bit tests per row,
  * no allocation beyond the md5 digest. */
case class BloomMightContain(left: Expression, right: Expression,
                             mBits: Int, kHashes: Int)
  extends BinaryExpression with BinaryLike[Expression] {

  // same contract as BloomBuildAgg: a probe built with kHashes > 8 would
  // overflow h1 + j*h2 to a negative position (AIOOBE at runtime); a
  // mismatched mBits silently probes the wrong bit positions
  require(Integer.bitCount(mBits) == 1 && mBits >= 8,
    s"mBits=$mBits must be a power of two >= 8")
  require(kHashes >= 1 && kHashes <= 8,
    s"kHashes=$kHashes: the double-hashed family is overflow-proof only for j <= 7")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bitmap: Any, key: Any): Any =
    BloomFns.mightContain(bitmap.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String], mBits, kHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) =>
      s"graft.functions.BloomFns$$.MODULE$$.mightContain($b, $k, $mBits, $kHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
