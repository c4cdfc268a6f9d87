package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native one-pass tokenize/shingle expressions must be
  * value-identical to the legacy column formulas they replaced — the
  * formulas are re-built here verbatim as the executable contract.
  * Plain ScalaCheck with fixed seeds (the scalatest bridge artifact is
  * not in the offline cache — same pattern as PropertySpec). */
class NativeTextSpec extends SparkSpec {
  import spark.implicits._

  // ---- the former column-function formulations (the contract) ----
  private def legacyTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  private def legacyNgrams(text: Column, n: Int): Column = {
    val w = legacyTokens(text)
    val m = size(w) - (n - 1)
    when(m < 1, array().cast("array<string>"))
      .otherwise(
        transform(arrays_zip((0 until n).map(k => slice(w, lit(k + 1), m).as(s"_$k")): _*),
          s => concat_ws(" ", (0 until n).map(k => s.getField(s"_$k")): _*)))
  }

  private def legacyShingleHashes(text: Column, n: Int): Column = {
    val w = legacyTokens(text)
    val m = size(w) - (n - 1)
    when(m < 1, array().cast("array<long>"))
      .otherwise(array_distinct(
        transform(arrays_zip((0 until n).map(k => slice(w, lit(k + 1), m).as(s"_$k")): _*),
          s => xxhash64((0 until n).map(k => s.getField(s"_$k")): _*))))
  }

  // fragments hit every edge the splitter must reproduce: all five
  // Java-\s separators, runs, leading/trailing separators (the
  // limit = -1 empty tokens), NBSP (NOT a Java-\s match — must stay
  // inside a token), multi-byte UTF-8, blank/space-only text
  private val fragGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaNumChar),
    Gen.oneOf("a", "éß漢", " ", "don't", "a,b.", "𝒳", "x"),
    Gen.nonEmptyListOf(Gen.oneOf(" ", "\t", "\n", "", "\f", "\r")).map(_.mkString))
  private val textGen: Gen[String] =
    Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, fragGen).map(_.mkString))

  private def sampleTexts(seed: Long, n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(seed + i)))

  private def compare(mkNative: Column => Column, mkLegacy: Column => Column,
                      texts: Seq[String]): Unit = {
    val df = texts.toDF("t")
    val bad = df.select(mkNative($"t").as("a"), mkLegacy($"t").as("b"), $"t")
      .filter(not($"a" <=> $"b"))
      .collect()
    assert(bad.isEmpty,
      s"native != legacy on: ${bad.take(5).map(_.toString).mkString("; ")}")
  }

  private val pinned = Seq(
    "", " ", "  ", "\t", "\n\n", " \t ", "a", " a ", "\ta\t", "a b c d e",
    "a  b\tc\nd", " ", "a b c", "é ß 漢 字", "one", "one two",
    "x\r\ny", "z\f", "a a a a", "trailing tab\t", "\tleading tab", "  ")

  describe("native tokenize/shingle expressions vs legacy formulas") {
    it("tokens: pinned edges + 120 generated texts") {
      compare(TextFunctions.tokens, legacyTokens, pinned)
      compare(TextFunctions.tokens, legacyTokens, sampleTexts(1, 120))
    }
    it("wordNgrams(2,3): pinned edges + generated texts") {
      for (n <- Seq(2, 3)) {
        compare(TextFunctions.wordNgrams(_, n), legacyNgrams(_, n), pinned)
        compare(TextFunctions.wordNgrams(_, n), legacyNgrams(_, n), sampleTexts(100 + n, 80))
      }
    }
    it("wordShingles(2,3) = array_distinct of legacy ngrams") {
      for (n <- Seq(2, 3)) {
        compare(TextFunctions.wordShingles(_, n),
                t => array_distinct(legacyNgrams(t, n)), pinned)
        compare(TextFunctions.wordShingles(_, n),
                t => array_distinct(legacyNgrams(t, n)), sampleTexts(200 + n, 80))
      }
    }
    it("wordShingleHashes(3): hash values bit-identical to the xxhash64 fold") {
      compare(TextFunctions.wordShingleHashes(_, 3), legacyShingleHashes(_, 3), pinned)
      compare(TextFunctions.wordShingleHashes(_, 3), legacyShingleHashes(_, 3),
              sampleTexts(300, 120))
    }
    it("minhashSig(3, 8) = array_min over the md5-halves double-hash family") {
      def legacySig(t: Column): Column = {
        val hh = transform(TextFunctions.wordShingles(t, 3),
                           s => TextFunctions.md5Halves60(s))
        // legacy yields nulls for < n tokens where native yields [];
        // normalize both to the defined (non-empty) shape for compare
        array((0 until 8).map(j =>
          array_min(transform(hh, x => x.getItem(0) + lit(j.toLong) * x.getItem(1)))): _*)
      }
      def nativeSig(t: Column): Column = {
        import org.apache.spark.sql.GraftColumnBridge
        GraftColumnBridge.column(graft.functions.MinhashSigExpr(
          GraftColumnBridge.expression(t), 3, 8))
      }
      // each side signals "< n tokens" differently (native: empty
      // array; legacy: 8 nulls) — normalize both to NULL for compare
      def dn(c: Column): Column = when(size(c) > 0, c)
      def dl(c: Column): Column = when(element_at(c, 1).isNotNull, c)
      compare(t => dn(nativeSig(t)), t => dl(legacySig(t)), pinned)
      compare(t => dn(nativeSig(t)), t => dl(legacySig(t)), sampleTexts(400, 120))
    }
    it("null text propagates null through every native expression") {
      val df = Seq[Option[String]](None, Some("a b")).toDF("t")
      val r = df.select(
        TextFunctions.tokens($"t").isNull,
        TextFunctions.wordNgrams($"t", 2).isNull,
        TextFunctions.wordShingles($"t", 3).isNull,
        TextFunctions.wordShingleHashes($"t", 3).isNull).collect()
      assert(r(0).toSeq == Seq(true, true, true, true))
      assert(r(1).toSeq == Seq(false, false, false, false))
    }
  }
}
