package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's portable hash: the value is DEFINED as
  * `conv(substring(md5(concat(seed, ':', v)), 1, 15), 16, 10)` — the
  * first 15 hex chars (60 bits) of the md5 as a long — because that
  * exact function is expressible in the DuckDB oracle. This expression
  * computes the same number straight from the digest bytes: no hex
  * string, no decimal-string conv, no per-row concat; one ThreadLocal
  * MessageDigest per task thread.
  *
  * First 15 hex chars = bytes 0..6 plus the high nibble of byte 7 =
  * the top 60 bits of the first 8 digest bytes (big-endian) — i.e.
  * `(first8BE >>> 4)`.
  */
case class PortableHashExpr(child: Expression, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash"

  override def nullSafeEval(input: Any): Any =
    PortableHashExpr.compute(seed, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHashExpr$$.MODULE$$.compute($seed, $c)")

  override protected def withNewChildInternal(newChild: Expression): PortableHashExpr =
    copy(child = newChild)
}

/** Both 60-bit halves of one md5 digest as `array<bigint>(2)`:
  * element 0 = hex chars 1..15 (top 60 bits of bytes 0..7), element 1 =
  * hex chars 17..31 (top 60 bits of bytes 8..15). One digest feeds a
  * whole double-hashed MinHash family h_j = h1 + j·h2
  * (Kirsch–Mitzenmacher) instead of `numHashes` independent md5
  * computations per shingle — and both halves stay expressible in the
  * DuckDB oracle as `CAST('0x' || substring(md5(v), 1|17, 15) AS
  * BIGINT)`. */
case class Md5Halves60(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_halves60"

  override def nullSafeEval(input: Any): Any =
    PortableHashExpr.computeHalves(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHashExpr$$.MODULE$$.computeHalves($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Halves60 =
    copy(child = newChild)
}

object PortableHashExpr {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // seed prefixes ("<seed>:") are tiny and reused across every row
  private val prefixCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()

  def compute(seed: Int, v: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(prefixCache.computeIfAbsent(seed, s => s"$s:".getBytes("UTF-8")))
    md.update(v.getBytes)
    val d = md.digest()
    val first8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    first8 >>> 4
  }

  /** Both 60-bit halves of md5 over raw bytes — the allocation-free
    * core [[computeHalves]] and [[TextNative.minhashSig]] share.
    * Returns packed (h1, h2) via a reusable 2-slot scratch per thread. */
  private val halvesScratch: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](2))

  def halvesOfBytes(bytes: Array[Byte], off: Int, len: Int): Array[Long] = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    def top60(o: Int): Long = {
      val be =
        ((d(o) & 0xffL) << 56) | ((d(o + 1) & 0xffL) << 48) |
        ((d(o + 2) & 0xffL) << 40) | ((d(o + 3) & 0xffL) << 32) |
        ((d(o + 4) & 0xffL) << 24) | ((d(o + 5) & 0xffL) << 16) |
        ((d(o + 6) & 0xffL) << 8) | (d(o + 7) & 0xffL)
      be >>> 4
    }
    val out = halvesScratch.get()
    out(0) = top60(0); out(1) = top60(8)
    out
  }

  def computeHalves(v: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val md = digests.get()
    md.reset()
    md.update(v.getBytes)
    val d = md.digest()
    def top60(off: Int): Long = {
      val be =
        ((d(off) & 0xffL) << 56) | ((d(off + 1) & 0xffL) << 48) |
        ((d(off + 2) & 0xffL) << 40) | ((d(off + 3) & 0xffL) << 32) |
        ((d(off + 4) & 0xffL) << 24) | ((d(off + 5) & 0xffL) << 16) |
        ((d(off + 6) & 0xffL) << 8) | (d(off + 7) & 0xffL)
      be >>> 4
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(top60(0), top60(8)))
  }
}
