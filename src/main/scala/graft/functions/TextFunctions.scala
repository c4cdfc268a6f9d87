package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (BASELINE.json north star): tokenization, shingling, portable
  * hashing, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything here is built from codegen'd Catalyst expressions (split /
  * regexp / higher-order array functions) — no UDFs — so the operators
  * scale to the 100 TB documents table without leaving whole-stage
  * codegen.
  */
object TextFunctions {

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(e)
  }
  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.expression(c)
  }

  /** Whitespace tokenization; empty/blank text → empty array (Spark's
    * split would return [""] which breaks token counts).
    *
    * Value-equal to `when(length(trim(text)) === 0, array())
    * .otherwise(split(trim(text), "\\s+"))` but computed by the
    * one-pass native [[TokensExpr]] (NativeTextSpec property-checks
    * the equivalence) — the regex split plus its per-column
    * re-evaluation was the largest map-side CPU item in the dedup
    * suite. */
  def tokens(text: Column): Column = native(TokensExpr(expr(text)))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Distinct word n-gram shingles: ["a","b","c","d"], n=3 →
    * ["a b c","b c d"]. Fewer than n words → empty.
    *
    * Formulated as `arrays_zip` of n shifted slices with a lambda that
    * touches ONLY the zipped element — never `transform(sequence(...),
    * i => slice(w, i, n))`, whose lambda body re-evaluates the whole
    * tokenize subtree (trim + regex split) once PER ELEMENT (higher-order
    * functions don't share subexpressions with the enclosing row scope;
    * measured 5× slower on the documents corpus). */
  def wordShingles(text: Column, n: Int): Column =
    native(ShinglesExpr(expr(text), n))

  /** ALL word n-grams in order (duplicates kept) — the denominator for
    * repetition metrics, where `wordShingles`'s distinct set would hide
    * exactly the duplication being measured.
    *
    * Value-equal to the former `arrays_zip` of n shifted slices with a
    * `concat_ws` lambda, computed by the one-pass native [[NGramsExpr]]
    * (the zip materialized n sliced token arrays plus a struct array
    * per document; NativeTextSpec pins the equivalence). */
  def wordNgrams(text: Column, n: Int): Column =
    native(NGramsExpr(expr(text), n))

  /** Portable 60-bit hash: first 15 hex chars of md5(seed:value) as a
    * non-negative long. Chosen over Spark's murmur3 `hash()` because the
    * EXACT same function is expressible in the DuckDB oracle
    * (`CAST('0x' || substring(md5(...), 1, 15) AS BIGINT)`), so MinHash /
    * SimHash sketches are hash-verifiable, not just rows-checked.
    * Computed by the native [[PortableHashExpr]] (digest bytes directly,
    * no hex/conv/concat allocations) — value identical to the column
    * formula `conv(substring(md5(concat(seed,':',v)),1,15),16,10)`. */
  def portableHash(c: Column, seed: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PortableHashExpr(GraftColumnBridge.expression(c), seed))
  }

  /** Distinct 64-bit hashes of the word n-grams — the native
    * [[ShingleHashesExpr]] folds each token through the same seed-42
    * `XXH64.hashUTF8String` chain that `xxhash64(t₀, t₁, t₂)` applies
    * (bit-identical values, so join keys and candidate sets are
    * unchanged), over zero-copy token views: no "t₀ t₁ t₂" string, no
    * token array, no zipped struct array. Tokens contain no whitespace,
    * so hash-tuple identity ≡ string-shingle identity modulo 2⁻⁶⁴
    * collisions — count-identical to the oracle's string formulation. */
  def wordShingleHashes(text: Column, n: Int): Column =
    native(ShingleHashesExpr(expr(text), n))

  /** Both 60-bit halves of one md5(v) as array<bigint>(2) — feeds the
    * double-hashed MinHash family (see [[Md5Halves60]]). */
  def md5Halves60(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Md5Halves60(GraftColumnBridge.expression(c)))
  }

  /** Canonical text form for fingerprinting: lowercase, collapsed
    * whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** 60-bit document fingerprint of the normalized text (exact-dup
    * detection at scale: group/join on a long instead of a long string). */
  def fingerprint(text: Column): Column = portableHash(normalize(text), 0)

  /** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken 2003,
    * the MOSS algorithm): over the in-order word n-gram hashes, every
    * sliding window of `w` consecutive hashes selects its minimum
    * (rightmost on ties); the distinct selected (hash, position) pairs
    * are the document's fingerprints. Guarantees: any shared substring
    * of >= w+n-1 tokens yields a shared fingerprint (no false
    * negatives for long matches), and expected density is 2/(w+1) — the
    * sampling bound q31's single min-hash cannot offer.
    *
    * Entirely in-row and MAP-ONLY — no shuffle at any corpus size;
    * winnowing is per-document local, so the 100 TB plan is scan →
    * explode of the selected set only. Computed by the one-pass native
    * [[WinnowExpr]] (gram hash array + sliding rightmost-min with
    * change-detection): the first formulation here — `transform` over
    * window starts with an `aggregate` argmin over a `slice` of the
    * hash array — was value-identical but ran ~12× slower at sf0.1
    * (higher-order lambdas evaluate interpreted, and every window paid
    * a w-element slice copy plus per-step struct allocation; TextSpec's
    * reference-equality cases pin the semantics the rewrite preserved).
    *
    * Returns array<struct<h,pos>>; empty when the doc has < n tokens. */
  def winnowFingerprints(text: Column, n: Int, w: Int, seed: Int): Column =
    native(WinnowExpr(expr(text), n, w, seed))

  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are stopwords (0 when no tokens). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, w => w.isin(stopwords: _*))).cast("double") / size(t))
  }

  private def classRatio(text: Column, charClass: String): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, charClass, "")).cast("double") / length(text))

  def alphaRatio(text: Column): Column = classRatio(text, "[^a-zA-Z]")
  def digitRatio(text: Column): Column = classRatio(text, "[^0-9]")
  def punctRatio(text: Column): Column = classRatio(text, "[^.,;:!?'\"()-]")

  /** Mean token length (0 when no tokens). */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Engine-portable 6-decimal rounding: floor(x·10⁶ + 0.5)/10⁶ in
    * plain IEEE doubles — bit-identical in any engine. Spark's round()
    * is decimal HALF_UP over the exact binary expansion while DuckDB
    * rounds through double arithmetic; on knife-edge doubles the two
    * disagree by 10⁻⁶ (observed on one document at sf0.1). Only for
    * non-negative inputs. */
  def portableRound6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Heuristic document quality score in [0,1]: rewards alphabetic
    * content, plausible word lengths, and stopword presence; penalizes
    * digit/punct noise. Mirrors the length/punct/stopword-ratio scoring
    * used by public LLM-corpus filters. */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val wordLenOk = {
      val a = avgTokenLen(text)
      when(a >= 2 && a <= 12, lit(1.0)).otherwise(lit(0.0))
    }
    portableRound6(
      lit(0.35) * alphaRatio(text) +
      lit(0.25) * lenTerm +
      lit(0.15) * wordLenOk +
      lit(0.15) * least(stopwordRatio(text) * 5.0, lit(1.0)) +
      lit(0.10) * (lit(1.0) - least(digitRatio(text) * 10.0, lit(1.0))))
  }

  /** Per-language marker vocabularies for the n-gram/stopword language
    * ID heuristic. Deliberately tiny & deterministic. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "is", "of", "to"),
    "es" -> Seq("el", "la", "los", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  private def langScore(text: Column, markers: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(markers: _*))).cast("double")
  }

  /** Predicted language code; deterministic tie-break = alphabetical
    * preference order of langMarkers. Returns "und" when no marker hits. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first lang (in fixed order) achieving the max score wins
    val cases = scores.foldRight(lit("und")) { case ((l, s), els) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
    cases
  }

  /** DuckDB SQL fragments mirroring the above, for oracle strings. */
  object sql {
    val tokensOf: String => String = t =>
      s"(CASE WHEN length(trim($t)) = 0 THEN [] ELSE string_split_regex(trim($t), '\\s+') END)"
    def portableHash(expr: String, seed: Int): String =
      s"CAST('0x' || substring(md5('$seed:' || $expr), 1, 15) AS BIGINT)"
    /** The two 60-bit md5 halves backing the double-hashed MinHash
      * family (offset 1 → h1, offset 17 → h2). */
    def md5Half(expr: String, off: Int): String =
      s"CAST('0x' || substring(md5($expr), $off, 15) AS BIGINT)"
    def normalize(t: String): String =
      s"regexp_replace(lower(trim($t)), '\\s+', ' ', 'g')"
  }
}
