package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EIP-55 mixed-case address checksumming (SURVEY.md §2.9 E21; the
  * reference checksums RPC addresses via `Web3.to_checksum_address`,
  * main.py:206,211).
  *
  * Definition (EIP-55, public spec): take the 40-char lowercase hex
  * address without its `0x` prefix, Keccak-256 the ASCII bytes of that
  * string, and uppercase the i-th hex letter iff the i-th nibble of the
  * digest is ≥ 8. Keccak-256 is the ORIGINAL Keccak (pad byte 0x01),
  * not FIPS SHA3-256 (pad byte 0x06) — the JDK only ships the latter,
  * so the permutation is implemented here from the public Keccak
  * reference specification.
  *
  * Malformed input (not 40 hex chars after stripping an optional 0x)
  * yields null rather than a task failure — consistent with the
  * engine's quarantine-don't-crash policy for poisoned rows.
  */
case class Eip55Checksum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "eip55_checksum"

  override def nullSafeEval(input: Any): Any =
    Eip55.checksum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Eip55$$.MODULE$$.checksum($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Eip55Checksum =
    copy(child = newChild)
}

object Eip55 {

  def eip55_checksum(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Eip55Checksum(GraftColumnBridge.expression(c)))
  }

  /** Null for anything that is not a 40-hex-char address (with or
    * without 0x prefix). */
  def checksum(addr: UTF8String): UTF8String = {
    val s0 = addr.toString.trim
    val s = if (s0.startsWith("0x") || s0.startsWith("0X")) s0.substring(2) else s0
    if (s.length != 40) return null
    val lower = new Array[Byte](40)
    var i = 0
    while (i < 40) {
      val c = Character.toLowerCase(s.charAt(i))
      val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')
      if (!ok) return null
      lower(i) = c.toByte
      i += 1
    }
    val digest = Keccak256.hash(lower)
    val out = new Array[Char](42)
    out(0) = '0'; out(1) = 'x'
    i = 0
    while (i < 40) {
      val c = lower(i).toChar
      val nibble = (digest(i >> 1) >> (if ((i & 1) == 0) 4 else 0)) & 0xf
      out(i + 2) = if (c >= 'a' && nibble >= 8) Character.toUpperCase(c) else c
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Keccak-256 (original padding, as used by Ethereum) implemented from
  * the public Keccak reference: Keccak-f[1600] sponge, rate 1088 bits
  * (136 bytes), capacity 512, 24 rounds, pad10*1 with domain byte 0x01.
  * Verified in Eip55Spec against the published digest of the empty
  * string and the EIP-55 spec's own test vectors. */
object Keccak256 {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808AL,
    0x8000000080008000L, 0x000000000000808BL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008AL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000AL,
    0x000000008000808BL, 0x800000000000008BL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800AL, 0x800000008000000AL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r(x, y), indexed [x + 5y]
  private val ROT: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14)

  private val Rate = 136 // bytes, for 256-bit output

  def hash(message: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    // absorb full blocks, then the padded final block
    val padded = {
      val padLen = Rate - (message.length % Rate)
      val p = java.util.Arrays.copyOf(message, message.length + padLen)
      p(message.length) = 0x01.toByte
      p(p.length - 1) = (p(p.length - 1) | 0x80).toByte
      p
    }
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < Rate / 8) {
        state(i) ^= leLong(padded, off + i * 8)
        i += 1
      }
      permute(state)
      off += Rate
    }
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((state(i) >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  private def leLong(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16) |
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 4) & 0xffL) << 32) |
    ((b(off + 5) & 0xffL) << 40) | ((b(off + 6) & 0xffL) << 48) |
    ((b(off + 7) & 0xffL) << 56)

  private def permute(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // θ
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        val d = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d; y += 1 }
        x += 1
      }
      // ρ + π: B[y, 2x+3y] = rotl(A[x, y], r[x, y])
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROT(x + 5 * y))
          y += 1
        }
        x += 1
      }
      // χ
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // ι
      a(0) ^= RC(round)
      round += 1
    }
  }
}
