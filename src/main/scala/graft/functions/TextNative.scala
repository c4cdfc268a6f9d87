package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass tokenize/shingle plane.
  *
  * The column-function formulations in [[TextFunctions]] (regex `split`
  * → `arrays_zip` of n shifted slices → `transform` lambda → `xxhash64`
  * / `concat_ws`) are semantically right but allocation-heavy: every
  * document materializes a token array, n sliced copies, a zipped
  * struct array, and per-shingle lambda rows — measured ~6.6 s of task
  * CPU across the sf0.1 dedup suite just tokenizing 270k tokens. At
  * 100 TB the tokenizer IS the map-side cost of every dedup/quality
  * operator, so it deserves the native-expression treatment the
  * engine's other hot primitives already get ([[PortableHashExpr]],
  * [[RollingMinHash]]).
  *
  * These expressions compute the SAME values in one pass over the
  * UTF-8 bytes (doGenCode = a static call, so they stay inside
  * whole-stage codegen):
  *
  *  - tokenization reproduces `split(trim(text), "\\s+")` exactly:
  *    trim strips 0x20 only; separators are the Java-regex `\s` class
  *    {TAB, LF, VT, FF, CR, SPACE} — all ASCII bytes, which in UTF-8
  *    never occur inside a multi-byte sequence, so byte scanning is
  *    exact; Spark's limit = -1 split keeps a leading/trailing empty
  *    token when the trimmed text starts/ends with a non-space
  *    separator; blank-after-trim text yields [] (the `tokens` guard).
  *  - shingle hashes fold each token through the same
  *    `XXH64.hashUTF8String` chain (seed 42) that the `xxhash64(t0,
  *    …, tn-1)` expression applies, over zero-copy token views — the
  *    values are bit-identical to the former formulation, so join
  *    keys and candidate sets are unchanged.
  *  - dedup keeps first occurrence, matching `array_distinct`.
  *
  * NativeTextSpec property-checks every expression against the legacy
  * column formulas on adversarial inputs (unicode, NBSP, CR/VT/FF,
  * leading/trailing runs, blanks).
  */
object TextNative {

  /** Java-regex `\s` byte class (ASCII only — `Pattern` without
    * UNICODE_CHARACTER_CLASS does not match U+00A0 etc., and neither
    * do we). */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Token boundaries of `split(trim(text), "\s+")` with Spark's
    * limit = -1 semantics, as (start, end) byte offsets into `bytes`
    * packed into one long each. Blank-after-trim → 0 tokens. */
  private def tokenBounds(bytes: Array[Byte]): Array[Long] = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    if (lo == hi) return Array.emptyLongArray
    // worst case: ceil(len/2) tokens + leading and trailing empties
    val out = new Array[Long]((hi - lo) / 2 + 3)
    var n = 0
    @inline def add(s: Int, e: Int): Unit = {
      out(n) = (s.toLong << 32) | (e.toLong & 0xffffffffL); n += 1
    }
    if (isWs(bytes(lo))) add(lo, lo) // leading empty token
    var i = lo
    while (i < hi) {
      if (isWs(bytes(i))) i += 1
      else {
        var j = i + 1
        while (j < hi && !isWs(bytes(j))) j += 1
        add(i, j)
        i = j
      }
    }
    if (isWs(bytes(hi - 1))) add(hi, hi) // trailing empty token
    java.util.Arrays.copyOf(out, n)
  }

  def tokens(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val b = tokenBounds(bytes)
    val arr = new Array[Any](b.length)
    var i = 0
    while (i < b.length) {
      val s = (b(i) >>> 32).toInt; val e = b(i).toInt
      arr(i) = UTF8String.fromBytes(bytes, s, e - s)
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** All n-token windows joined with single spaces, duplicates kept
    * (`wordNgrams`). */
  def ngrams(text: UTF8String, n: Int): ArrayData =
    ngramData(text, n, distinct = false)

  /** Distinct n-token windows, first occurrence kept (`wordShingles`). */
  def shingles(text: UTF8String, n: Int): ArrayData =
    ngramData(text, n, distinct = true)

  private def ngramData(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = text.getBytes
    val b = tokenBounds(bytes)
    val m = b.length - (n - 1)
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](m)
    val seen = if (distinct) new java.util.HashSet[UTF8String](m * 2) else null
    var w = 0
    while (w < m) {
      var len = n - 1 // n-1 separator spaces
      var k = 0
      while (k < n) { len += b(w + k).toInt - (b(w + k) >>> 32).toInt; k += 1 }
      val g = new Array[Byte](len)
      var p = 0
      k = 0
      while (k < n) {
        if (k > 0) { g(p) = 0x20; p += 1 }
        val s = (b(w + k) >>> 32).toInt; val e = b(w + k).toInt
        System.arraycopy(bytes, s, g, p, e - s); p += e - s
        k += 1
      }
      val u = UTF8String.fromBytes(g)
      if (seen == null || seen.add(u)) out.add(u)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct 64-bit window hashes (`wordShingleHashes`): the same
    * seed-42 `XXH64.hashUTF8String` fold `xxhash64(t0, …, tn-1)`
    * computes, over zero-copy token views — values bit-identical to
    * the legacy formulation. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val b = tokenBounds(bytes)
    val m = b.length - (n - 1)
    if (m < 1) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    var cnt = 0
    var w = 0
    while (w < m) {
      var h = 42L
      var k = 0
      while (k < n) {
        val s = (b(w + k) >>> 32).toInt; val e = b(w + k).toInt
        h = XXH64.hashUTF8String(UTF8String.fromBytes(bytes, s, e - s), h)
        k += 1
      }
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }

  /** One-pass per-row MinHash signature: for every n-token window
    * (duplicates harmless — min over a multiset = min over its set, so
    * no dedup structure is kept), md5 halves (h1, h2) feed the
    * double-hashed family h1 + j·h2 and `numHashes` running minima
    * update in place. Values identical to the exploded-shingle
    * `MIN(h1 + j*h2) GROUP BY doc` formulation the oracle uses, and to
    * the higher-order-column formulation (`transform` + `array_min`) it
    * replaces — which evaluated its lambdas interpreted, one md5 plus
    * per-element allocations per shingle OUTSIDE codegen (the winnowing
    * lesson, TextFunctions.winnowFingerprints). Returns an EMPTY array
    * when the text has < n tokens (callers filter
    * `size(sig) > 0`). */
  def minhashSig(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val bytes = text.getBytes
    val b = tokenBounds(bytes)
    val m = b.length - (n - 1)
    if (m < 1) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // reusable shingle buffer sized to the longest window
    var maxLen = 0
    var w0 = 0
    while (w0 < m) {
      var len = n - 1
      var k = 0
      while (k < n) { len += b(w0 + k).toInt - (b(w0 + k) >>> 32).toInt; k += 1 }
      if (len > maxLen) maxLen = len
      w0 += 1
    }
    val g = new Array[Byte](maxLen)
    var w = 0
    while (w < m) {
      var p = 0
      var k = 0
      while (k < n) {
        if (k > 0) { g(p) = 0x20; p += 1 }
        val s = (b(w + k) >>> 32).toInt; val e = b(w + k).toInt
        System.arraycopy(bytes, s, g, p, e - s); p += e - s
        k += 1
      }
      val hh = PortableHashExpr.halvesOfBytes(g, 0, p)
      val h1 = hh(0); val h2 = hh(1)
      var j = 0
      while (j < numHashes) {
        val v = h1 + j.toLong * h2
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken 2003)
    * in ONE pass: portable-md5 gram hashes, then the rightmost minimum
    * of every `w`-window of consecutive hashes, recorded when the
    * selected position changes. The selected position is non-decreasing
    * as the window slides (rightmost tie-break: a new equal-or-smaller
    * hash moves the selection right; a dropped selection re-selects
    * inside the remaining window), so change-detection yields exactly
    * the distinct (hash, position) set of the per-window argmin
    * formulation the oracle SQL uses. Returns array<struct<h,pos>>. */
  def winnow(text: UTF8String, n: Int, w: Int, seed: Int): ArrayData = {
    val bytes = text.getBytes
    val b = tokenBounds(bytes)
    val m = b.length - (n - 1)
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    var g0 = 0
    while (g0 < m) {
      var len = n - 1
      var k = 0
      while (k < n) { len += b(g0 + k).toInt - (b(g0 + k) >>> 32).toInt; k += 1 }
      val g = new Array[Byte](len)
      var p = 0
      k = 0
      while (k < n) {
        if (k > 0) { g(p) = 0x20; p += 1 }
        val s = (b(g0 + k) >>> 32).toInt; val e = b(g0 + k).toInt
        System.arraycopy(bytes, s, g, p, e - s); p += e - s
        k += 1
      }
      hs(g0) = PortableHashExpr.compute(seed, UTF8String.fromBytes(g))
      g0 += 1
    }
    val selH = new Array[Long](m)
    val selP = new Array[Int](m)
    var cnt = 0
    var lastPos = -1
    val lastStart = math.max(m - w, 0)
    var i = 0
    while (i <= lastStart) {
      var minH = Long.MaxValue
      var minP = -1
      val end = math.min(i + w, m)
      var j = i
      while (j < end) {
        if (hs(j) <= minH) { minH = hs(j); minP = j } // <= keeps rightmost
        j += 1
      }
      if (minP != lastPos) { selH(cnt) = minH; selP(cnt) = minP; cnt += 1; lastPos = minP }
      i += 1
    }
    val out = new Array[Any](cnt)
    var k2 = 0
    while (k2 < cnt) {
      out(k2) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](selH(k2), selP(k2).toLong))
      k2 += 1
    }
    new GenericArrayData(out)
  }
}

case class WinnowExpr(child: Expression, n: Int, w: Int, seed: Int)
    extends UnaryExpression {
  require(n >= 1 && w >= 1, s"gram size and window must be >= 1, got n=$n w=$w")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pos", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_native"
  override def nullSafeEval(input: Any): Any =
    TextNative.winnow(input.asInstanceOf[UTF8String], n, w, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNative$$.MODULE$$.winnow($c, $n, $w, $seed)")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens_native"
  override def nullSafeEval(input: Any): Any =
    TextNative.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative$$.MODULE$$.tokens($c)")
  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

case class NGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngrams_native"
  override def nullSafeEval(input: Any): Any =
    TextNative.ngrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative$$.MODULE$$.ngrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NGramsExpr =
    copy(child = newChild)
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_native"
  override def nullSafeEval(input: Any): Any =
    TextNative.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative$$.MODULE$$.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

case class MinhashSigExpr(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(numHashes >= 1 && numHashes <= 8,
    "double-hashed family h1 + j*h2 is overflow-proof only for j <= 7")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_native"
  override def nullSafeEval(input: Any): Any =
    TextNative.minhashSig(input.asInstanceOf[UTF8String], n, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNative$$.MODULE$$.minhashSig($c, $n, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_native"
  override def nullSafeEval(input: Any): Any =
    TextNative.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNative$$.MODULE$$.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}
