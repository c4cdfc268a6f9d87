package graft.queries

/** DuckDB mirror of [[graft.functions.Keccak256]] for q50 — making even
  * the EIP-55 checksum hash-checkable (DuckDB ships no keccak).
  *
  * The input here is always a 40-hex-char address = 40 ASCII bytes <
  * the 136-byte sponge rate, so absorption is ONE block: lanes 0–4
  * carry the address bytes little-endian, lane 5 = 0x01 (pad start),
  * lane 16 = 0x80·2⁵⁶ (pad end), rest zero. The 24 Keccak-f[1600]
  * rounds are UNROLLED by this generator into chained CTEs (θ parities
  * → θ/ρ/π → χ+ι per round), with lanes as HUGEINT values in [0, 2⁶⁴):
  * xor/&/shifts are exact there, rotl(v,n) = (v·2ⁿ mod 2⁶⁴) + (v ≫
  * 64−n) (the two parts occupy disjoint bits, and a 128-bit shift of a
  * positive value is logical), and ¬v = 2⁶⁴−1−v. Validated in DuckDB
  * against the EIP-55 published vector and 50 random addresses vs the
  * reference implementation before adoption; continuously checked by
  * the q50 hash-match in every CORRECTNESS run (the Scala side is
  * additionally pinned by Eip55Spec's EIP vectors).
  *
  * Cost note: ~1 ms/row in DuckDB (unrolled 24 rounds × ~300 HUGEINT
  * ops through the vectorized executor), which is why q50 checksums a
  * deterministic 1-in-11 customer subset — full correctness coverage of
  * the operator without distorting the oracle suite's wall-clock. */
object KeccakOracle {

  private val Rot = Array(
    0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43,
    25, 39, 41, 45, 15, 21, 8, 18, 2, 61, 56, 14)

  private val Rc = Array(
    "1", "32898", "9223372036854808714", "9223372039002292224",
    "32907", "2147483649", "9223372039002292353", "9223372036854808585",
    "138", "136", "2147516425", "2147483658",
    "2147516555", "9223372036854775947", "9223372036854808713", "9223372036854808579",
    "9223372036854808578", "9223372036854775936", "32778", "9223372039002259466",
    "9223372039002292353", "9223372036854808704", "2147483649", "9223372039002292232")

  private val M = "18446744073709551616::HUGEINT" // 2^64

  private def rotl(v: String, n: Int): String =
    if (n == 0) v
    else s"((($v) << $n) % $M + (($v) >> ${64 - n}))"

  private def xor(xs: String*): String = xs.reduce((a, b) => s"xor($a, $b)")

  /** Full oracle SQL: `addrExpr` must yield 40 lowercase hex chars per
    * row of `fromClause`; output columns (`idName`, checksummed). */
  def eip55Sql(idExpr: String, idName: String, addrExpr: String,
               fromClause: String): String = {
    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    val init = (0 until 5).map { k =>
      (0 until 8).map(b => s"(ord(substr(a, ${8 * k + b + 1}, 1))::HUGEINT << ${8 * b})")
        .mkString(" + ") + s" AS l$k"
    } ++ Seq("1::HUGEINT AS l5") ++
      (6 until 16).map(k => s"0::HUGEINT AS l$k") ++
      Seq("9223372036854775808::HUGEINT AS l16") ++
      (17 until 25).map(k => s"0::HUGEINT AS l$k")
    ctes += s"s0 AS (SELECT id, a, ${init.mkString(", ")} FROM addr)"
    var prev = "s0"
    for (r <- 0 until 24) {
      val cs = (0 until 5)
        .map(x => xor(s"l$x", s"l${x + 5}", s"l${x + 10}", s"l${x + 15}", s"l${x + 20}") + s" AS c$x")
      ctes += s"c$r AS (SELECT *, ${cs.mkString(", ")} FROM $prev)"
      val es = (0 until 25).map { i =>
        xor(s"l$i", xor(s"c${(i % 5 + 4) % 5}", rotl(s"c${(i % 5 + 1) % 5}", 1))) + s" AS e$i"
      }
      ctes += s"e$r AS (SELECT id, a, ${es.mkString(", ")} FROM c$r)"
      val bs = new Array[String](25)
      for (x <- 0 until 5; y <- 0 until 5)
        bs(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(s"e${x + 5 * y}", Rot(x + 5 * y))
      ctes += s"b$r AS (SELECT id, a, ${bs.zipWithIndex.map { case (e, i) => s"$e AS b$i" }.mkString(", ")} FROM e$r)"
      val gs = (0 until 25).map { i =>
        val x = i % 5; val y = i / 5
        val chi = xor(s"b$i", s"(($M - 1 - b${(x + 1) % 5 + 5 * y}) & b${(x + 2) % 5 + 5 * y})")
        (if (i == 0) xor(chi, s"${Rc(r)}::HUGEINT") else chi) + s" AS l$i"
      }
      ctes += s"s${r + 1} AS (SELECT id, a, ${gs.mkString(", ")} FROM b$r)"
      prev = s"s${r + 1}"
    }
    // digest = lanes l0..l3 little-endian; hex digit p of the digest is
    // the high (p even) / low nibble of byte p/2
    val nib = "((CASE (p//16) WHEN 0 THEN l0 WHEN 1 THEN l1 WHEN 2 THEN l2 ELSE l3 END" +
      " >> (8*((p//2)%8) + CASE WHEN p%2=0 THEN 4 ELSE 0 END)) & 15::HUGEINT)"
    val ch = "substr(a, p+1, 1)"
    ctes += s"fin AS (SELECT id, '0x' || array_to_string(list_transform(generate_series(0, 39), " +
      s"p -> CASE WHEN $ch >= 'a' AND $nib >= 8 THEN upper($ch) ELSE $ch END), '') AS checksummed FROM $prev)"
    (s"WITH addr AS (SELECT $idExpr AS id, $addrExpr AS a FROM $fromClause), " +
      ctes.mkString(", ") + s" SELECT id AS $idName, checksummed FROM fin").replace("\n", " ")
  }
}
