package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-corpus pipelines (BASELINE.json north
  * star): exact, word-n-gram Jaccard, MinHash+LSH, SimHash, and
  * pair→group resolution. All are pure DataFrame transforms built from
  * codegen'd expressions; hashes are `TextFunctions.portableHash`
  * (md5-based) so every sketch is reproducible in the DuckDB oracle.
  *
  * Scale design (100 TB documents):
  *  - exact dedup groups on the full 128-bit md5 of the normalized text
  *    — constant-width shuffle keys, cryptographic collision bound;
  *  - candidate generation (LSH bands / shingle join) is blocked (e.g.
  *    by lang) and verified pairwise only on candidates — never an
  *    unblocked O(n²) cross join;
  *  - hot shingles (stopword n-grams) are bounded by an explicit
  *    document-frequency cap before pair expansion; the MinHash path
  *    avoids the problem entirely (bounded signature size per doc).
  */
object Dedup {

  /** Production default for the hot-shingle df cap shared by every
    * shingle-pair entry point ([[ngramJaccardPairs]],
    * [[containmentPairs]], [[pairSimilarityStats]]). Named (not an
    * inline literal) so FixtureCanarySpec can assert the cap does NOT
    * bind on the shipped fixtures: the q107/q121 oracle rows compute
    * UNCAPPED exact similarity, which equals the capped production
    * default only while every (block, shingle) posting list stays at or
    * under this bound — a regenerated fixture that crosses it must fail
    * one named spec, not silently shift the oracle comparison's
    * semantics (round-9 next-round #5). */
  val DefaultMaxDf: Int = 100000

  /** Exact dedup core, parameterized on the grouping key so specs can
    * inject deliberately-colliding keys and prove the production key is
    * what prevents merges. `key` decides group identity; `fp` is the
    * reported 60-bit fingerprint (two texts that collide on `fp` but
    * differ on `key` correctly emit two rows with equal `fp`). */
  private[graft] def exactByKey(docs: DataFrame, key: Column, fp: Column,
                                idCol: String): DataFrame =
    docs.groupBy(key.as("k"), fp.as("fp"))
      .agg(min(col(idCol)).as("keep_id"),
           count(lit(1)).cast("long").as("n_dupes"))
      .select(col("fp"), col("keep_id"), col("n_dupes"))

  /** Exact dedup: one representative (min id) per identical normalized
    * text. Group identity is the FULL 128-bit md5 (not the 60-bit
    * display fingerprint): at 10¹² docs a 60-bit key expects ~4×10⁵
    * birthday-bound false merges, while 128 bits keeps the expectation
    * below 10⁻¹³ — and the shuffle key stays constant-width (32 hex
    * chars) no matter how large the documents are. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = normalize(col(textCol))
    exactByKey(docs, md5(norm.cast("binary")), fingerprint(col(textCol)), idCol)
  }

  /** The 128-bit exact-dedup content key (md5 of normalized text) — the
    * ONE definition of content identity shared by [[exact]], the
    * incremental-dedup path, and pipeline compositions. */
  def contentKey(textCol: String): Column =
    md5(normalize(col(textCol)).cast("binary"))

  /** Ids surviving exact dedup (min id per identical normalized text) —
    * the filtering form of [[exact]] for pipeline composition:
    * `docs.join(exactKeepIds(docs, "text", "doc_id"), Seq("doc_id"), "left_semi")`. */
  def exactKeepIds(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(contentKey(textCol).as("k"))
      .agg(min(col(idCol)).as(idCol)).select(col(idCol))

  /** Per-document distinct word n-gram shingles, exploded to
    * (id, block, shingle) rows. */
  private def shingleRows(docs: DataFrame, textCol: String, idCol: String,
                          blockCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), col(blockCol).as("block"),
                explode(wordShingles(col(textCol), n)).as("s"))

  /** Shared in-row posting-list pair expansion: `ids` is a sorted array,
    * emit all i<j element pairs as (pa, pb). Two chained `Generate`
    * operators (posexplode anchor + explode of the tail slice) instead
    * of nested `transform` lambdas building an array-of-struct-arrays:
    * higher-order-function lambdas evaluate interpreted (outside
    * whole-stage codegen) and allocate the full k²/2 pair array per row
    * before the outer explode, while Generate streams pairs row-by-row
    * through codegen — measured ~25% faster on the sf0.1 corpus and
    * allocation-free per pair. */
  private def listPairs(lists: DataFrame, idsCol: String): DataFrame =
    lists.select(col(idsCol).as("ids"), posexplode(col(idsCol)))
      .withColumnRenamed("pos", "i")
      .withColumnRenamed("col", "pa")
      .select(col("pa"),
        explode(slice(col("ids"), col("i") + lit(2),
                      greatest(size(col("ids")) - col("i") - 1, lit(0)))).as("pb"))

  /** Exact all-pairs jaccard via per-shingle posting lists. Join keys
    * are 64-bit xxhash64 of the shingle — the shuffle carries 8-byte
    * keys instead of strings (a 2^-64 cross-pair collision would
    * inflate one count; negligible and detectable as jaccard > 1).
    *
    * `maxDf` bounds the hot-shingle blowup: a shingle shared by k docs
    * in a block expands to k²/2 in-row pairs, so ONE stopword shingle
    * common to 10⁶ docs would build a 10¹²-element array in a single
    * row. The cap is applied CONSISTENTLY: shingles with block-df >
    * maxDf are removed from the shingle universe entirely — from the
    * intersection counts AND from each document's set size — so the
    * result is the exact jaccard over the df-filtered universe (the
    * standard df-cap semantics), not a deflated ratio mixing filtered
    * numerators with unfiltered denominators. With the default cap
    * effectively unbounded, this is plain exact jaccard.
    *
    * Note on alternatives: prefix filtering (join only the rare-first
    * prefix of each shingle set, then verify candidates) was measured
    * on this workload and LOST — the fixtures' small vocabulary makes
    * the pair-similarity graph dense, so candidates ≈ all pairs and
    * the per-pair set verification dominates. On a realistic corpus
    * (heavy-tailed shingle frequencies, sparse similarity) prefix
    * filtering wins; for guaranteed sub-quadratic behavior at 100 TB
    * use [[minhashLshPairs]]. Posting-list representation was also
    * shot out (round 7, Prof4, steady state): struct+array_sort,
    * struct-unsorted, packed-long, and bare-id lists all time
    * identically — the cost is the shingle-row shuffle and the
    * list-building aggregate itself, so the readable struct form
    * stays.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        blockCol: String, n: Int, threshold: Double,
                        maxDf: Int = DefaultMaxDf): DataFrame =
    shinglePairStats(docs, textCol, idCol, blockCol, n, maxDf)
      .select(col("id_a"), col("id_b"),
        (col("ic").cast("double") / (col("da") + col("db") - col("ic"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Shared exact posting-list core of the shingle pair family
    * ([[ngramJaccardPairs]], [[containmentPairs]],
    * [[pairSimilarityStats]]): per-pair intersection count `ic` and the
    * two df-capped set sizes `da`/`db` — every pair measure (jaccard,
    * both containment directions, overlap coefficient, dice) is a pure
    * column over these three.
    *
    * Shape: pairs from per-shingle posting lists instead of a
    * self-join — one groupBy on (block, shingle) then in-row pair
    * expansion, one full shuffle of the shingle table FEWER than the
    * equi-join (which exchanges both sides). Each doc's set size rides
    * along into the posting list, so the denominators normally need NO
    * per-doc count aggregate: the whole core is exactly two shuffles
    * (posting-list groupBy + pair-count groupBy). When the df-cap
    * BINDS, dropped hot shingles must also leave the denominators: the
    * correction is a per-doc count over the dropped lists only (linear
    * in hot-shingle postings, a vanishing fraction of the corpus),
    * EMPTY whenever the cap never binds — AQE then plans both
    * correction joins as broadcasts at runtime; if a pathological
    * corpus makes the adjustment table genuinely large, a shuffle join
    * is the correct plan and AQE picks that instead (no explicit
    * broadcast hint). The uncapped fast path keeps the ride-along
    * sizes as the set sizes and joins nothing back; the capped default
    * deliberately stays the production setting (an unbounded default
    * would reinstate the hot-shingle k-squared blowup out of the box).
    *
    * Round 13 (VERDICT r12 #8): on the capped path the posting-list
    * table is localCheckpoint'd once — its two consumers (pair plane,
    * hot correction) previously shared only the shuffle WRITE via
    * ReuseExchange and each re-ran the list-building aggregate, the
    * expensive half per Prof4. At sf0.1 the materialization job and
    * the saved second aggregate roughly cancel (q21/q107/q121 measured
    * inside same-window noise either way); the checkpoint is kept for
    * the structural guarantee — at open scale the aggregate's
    * collect_list+sort CPU over the full shingle volume dominates one
    * sequential local write of its output, and a plan that silently
    * aggregates the corpus twice is the kind of 2x a 100 TB run pays
    * for real. */
  private def shinglePairStats(docs: DataFrame, textCol: String, idCol: String,
                               blockCol: String, n: Int,
                               maxDf: Int): DataFrame =
    shinglePairStatsFromLists(shingleLists(docs, textCol, idCol, blockCol,
                                           n, maxDf), maxDf)

  /** The (block, shingle) posting-list table feeding
    * [[shinglePairStatsFromLists]]: one row per (block, shingle) with
    * the sorted (id, per-doc set size) list. On the capped path the
    * table is localCheckpoint'd — it feeds BOTH the pair plane
    * (≤ maxDf) and the hot-shingle correction (> maxDf), and
    * ReuseExchange shares only the shuffle WRITE between those
    * consumers; the list-building aggregate itself (the expensive half
    * per Prof4) would run twice (VERDICT r12 #8). The uncapped path
    * has a single consumer and skips the materialization job. The
    * checkpointed form is also what makes [[guardedJaccardPairs]]'
    * cap-bound probe a metadata-cheap job. */
  private def shingleLists(docs: DataFrame, textCol: String, idCol: String,
                           blockCol: String, n: Int, maxDf: Int): DataFrame = {
    val in = graft.ops.Parallelize.forCompute(docs)
    val sh = in.select(col(idCol).as("id"), col(blockCol).as("block"),
                       wordShingleHashes(col(textCol), n).as("ss"))
      .select(col("id"), col("block"), size(col("ss")).as("n_sh"),
              explode(col("ss")).as("sh"))
    val allLists0 = sh.groupBy(col("block"), col("sh"))
      .agg(array_sort(collect_list(struct(col("id"), col("n_sh")))).as("ids"))
    if (maxDf == Int.MaxValue) allLists0 else allLists0.localCheckpoint(true)
  }

  /** The pair plane over a prepared posting-list table (see
    * [[shingleLists]]): in-row pair expansion of the ≤ maxDf lists,
    * pair-count aggregate, and — when the cap can bind — the
    * consistent-universe denominator correction from the > maxDf
    * lists. */
  private def shinglePairStatsFromLists(allLists: DataFrame,
                                        maxDf: Int): DataFrame = {
    val lists = allLists.filter(size(col("ids")) > 1 && size(col("ids")) <= maxDf)
    val rawPairs = listPairs(lists, "ids")
      .select(col("pa.id").as("id_a"), col("pa.n_sh").as("na"),
              col("pb.id").as("id_b"), col("pb.n_sh").as("nb"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("ic"))
    if (maxDf == Int.MaxValue)
      rawPairs.select(col("id_a"), col("id_b"), col("ic"),
                      col("na").as("da"), col("nb").as("db"))
    else {
      val hotAdjust = allLists.filter(size(col("ids")) > maxDf)
        .select(explode(col("ids")).as("e"))
        .groupBy(col("e.id").as("id")).agg(count(lit(1)).as("n_hot"))
      rawPairs
        .join(hotAdjust.select(col("id").as("id_a"), col("n_hot").as("hot_a")),
              Seq("id_a"), "left")
        .join(hotAdjust.select(col("id").as("id_b"), col("n_hot").as("hot_b")),
              Seq("id_b"), "left")
        .select(col("id_a"), col("id_b"), col("ic"),
                (col("na") - coalesce(col("hot_a"), lit(0L))).as("da"),
                (col("nb") - coalesce(col("hot_b"), lit(0L))).as("db"))
    }
  }

  /** Asymmetric shingle-set CONTAINMENT pairs (Broder's containment
    * |A∩B|/|A| next to [[ngramJaccardPairs]]'s symmetric Jaccard): a
    * short document quoted inside a long one has tiny Jaccard (the long
    * doc's shingles swamp the union) but containment ≈ 1 on the short
    * side — the quote/subset/boilerplate-inclusion detector the
    * symmetric measure structurally misses. Reports both directions;
    * a pair surfaces when EITHER direction clears `threshold`.
    *
    * Same two-shuffle posting-list shape as the Jaccard path (per-
    * shingle lists with ride-along set sizes → in-row pair expansion →
    * pair-count aggregate; the corpus text never self-joins), and the
    * SAME `maxDf` hot-shingle bound with the same consistent-universe
    * semantics: a shingle shared by more than `maxDf` docs in a block
    * is removed from the shingle universe entirely — from the
    * intersection counts AND from both containment denominators — so
    * the result is exact containment over the df-filtered universe,
    * never a deflated ratio mixing a filtered numerator with unfiltered
    * denominators. Without the cap one stopword shingle shared by 10⁶
    * docs would build a 10¹²-element in-row pair array (the k² blowup
    * q21 documents); the correction costs one aggregate over the
    * dropped lists only, EMPTY (→ AQE broadcast) whenever the cap never
    * binds. This is the exact tier: at open scale the same containment
    * comes from the winnowed fingerprint sample (q102's MOSS join
    * reports it at 2/(w+1) density with the q101 shared-run guarantee),
    * which this operator's full-shingle answer certifies. */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
                       blockCol: String, n: Int, threshold: Double,
                       maxDf: Int = DefaultMaxDf): DataFrame =
    shinglePairStats(docs, textCol, idCol, blockCol, n, maxDf)
      .select(col("id_a"), col("id_b"), col("ic").as("n_shared"),
              (col("ic").cast("double") / col("da")).as("cont_a"),
              (col("ic").cast("double") / col("db")).as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)

  /** BOTH pair measures from ONE shingle pass: symmetric jaccard next
    * to the two directional containments, each pair surfacing when
    * jaccard clears `jaccardThreshold` OR either containment clears
    * `containmentThreshold`. A caller running [[ngramJaccardPairs]] and
    * [[containmentPairs]] separately pays the whole posting-list plane
    * (shingle explode + two shuffles) twice for the same `(ic, da, db)`
    * triple; this emits every measure in one pass — measured 2.05 s
    * combined → 1.22 s fused at sf0.1 (q21 0.98 + q107 1.07 vs q121,
    * same Bench session). */
  def pairSimilarityStats(docs: DataFrame, textCol: String, idCol: String,
                          blockCol: String, n: Int, jaccardThreshold: Double,
                          containmentThreshold: Double,
                          maxDf: Int = DefaultMaxDf): DataFrame =
    shinglePairStats(docs, textCol, idCol, blockCol, n, maxDf)
      .select(col("id_a"), col("id_b"), col("ic").as("n_shared"),
        (col("ic").cast("double") / (col("da") + col("db") - col("ic"))).as("jaccard"),
        (col("ic").cast("double") / col("da")).as("cont_a"),
        (col("ic").cast("double") / col("db")).as("cont_b"))
      .filter(col("jaccard") >= jaccardThreshold ||
              greatest(col("cont_a"), col("cont_b")) >= containmentThreshold)

  // The signature family is h1 + j·h2 over the two md5 halves
  // (Kirsch–Mitzenmacher double hashing): ONE md5 per shingle feeds the
  // whole family. Overflow-safe by construction: h1, h2 < 2⁶⁰, so
  // h1 + 7·h2 ≤ 2⁶³ − 8 < Long.MaxValue — provably no wraparound, which
  // matters because the DuckDB oracle RAISES on BIGINT overflow rather
  // than wrapping. Computed by graft.functions.MinhashSigExpr since
  // round 9 (see withMinhashSig).

  /** MinHash + LSH banding near-dup candidates, verified by exact
    * Jaccard. `numHashes` minhashes split into `bands` bands; a pair is
    * a candidate iff some band's full signature slice matches (classic
    * banding LSH). Candidates are then verified with the exact n-gram
    * Jaccard and filtered at `threshold`.
    *
    * At scale this is THE dedup path: per-doc state is a fixed
    * numHashes×8-byte signature, the candidate join keys are
    * (band, band-signature) — no shingle-frequency skew.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
                      blockCol: String, n: Int, numHashes: Int, bands: Int,
                      threshold: Double): DataFrame = {
    val in = graft.ops.Parallelize.forCompute(docs)
    val bandRows = lshBandRows(in, textCol, idCol, blockCol, n, numHashes, bands)
    // candidate pairs via posting lists on the band key (one groupBy
    // exchange) instead of a self-join (which exchanges both sides);
    // array_sort guarantees id_a < id_b in the in-row expansion. Band
    // collisions are bounded by the banding design (a hot band key
    // means near-identical signatures — already a dup cluster), so no
    // df-cap is needed here.
    val bandLists = bandRows.groupBy(col("block"), col("band_idx"), col("bk"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val candidates = listPairs(bandLists, "ids")
      .select(col("pa").as("id_a"), col("pb").as("id_b")).distinct()
    // Verify ONLY the candidate pairs (this is the entire point of LSH:
    // never run pairwise verification over the full corpus). Each side's
    // distinct shingle set is attached to the pair as 64-bit hashes
    // (8-byte elements instead of strings — smaller broadcast/shuffle
    // and cheaper intersection; counts identical modulo 2^-64).
    val sets = in.select(col(idCol).as("id"),
      array_sort(wordShingleHashes(col(textCol), n)).as("ss"))
    val verified = candidates
      .join(sets.select(col("id").as("id_a"), col("ss").as("sa")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("ss").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
         (size(col("sa")) + size(col("sb")) -
          size(array_intersect(col("sa"), col("sb"))))).as("jaccard"))
    verified.filter(col("jaccard") >= threshold)
  }

  /** The LSH banding pipeline shared by the within-corpus pair path and
    * the cross-corpus join path: per-row native MinHash signature
    * ([[withMinhashSig]]) → '|'-joined band keys, exploded to one row
    * per (id, block, band_idx, band-key).
    *
    * MAP-ONLY since round 9: the original formulation exploded shingle
    * rows and rebuilt signatures with a (id, block) groupBy — a full
    * shuffle of the shingle table BEFORE any banding. The one-pass
    * [[graft.functions.MinhashSigExpr]] computes the identical
    * double-hashed family in-row (min over the in-row shingle multiset
    * = MIN over exploded rows; NativeTextSpec pins it), so signature
    * construction now costs zero exchanges at any corpus size and the
    * first shuffle of every LSH consumer is the band-key candidate
    * stage itself. Band keys are unchanged ('|'-joined signature
    * slices, portable to SQL string concat). */
  private def lshBandRows(in: DataFrame, textCol: String, idCol: String,
                          blockCol: String, n: Int, numHashes: Int,
                          bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = withMinhashSig(
        in.select(col(idCol).as("id"), col(blockCol).as("block"),
                  col(textCol).as("__t")),
        "__t", "sig", n, numHashes)
      .filter(size(col("sig")) > 0)
    sig.select(col("id"), col("block"),
        posexplode(array((0 until bands).map { b =>
          concat_ws("|", (b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(j => element_at(col("sig"), j + 1).cast("string")): _*)
        }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bk")
  }

  /** Cross-corpus MinHash+LSH near-dup join — the near-dup twin of the
    * exact-key incremental anti-join: LEFT (an incoming batch) probes
    * RIGHT (the standing corpus) for near-duplicates. Candidates come
    * from an equi-join on (block, band_idx, band-key) — one shuffle per
    * side on 3-column keys — and are verified by exact shingle-hash
    * Jaccard at `threshold`. Returns (id_l, id_r, jaccard).
    *
    * Scale shape (100 TB standing corpus): the right side reduces to
    * its banded signature rows (bands × ~24 bytes per doc, no text);
    * in a production deployment those are PRECOMPUTED once per
    * snapshot and bucketed by band key, making the daily-batch probe
    * an exchange-free lookup on the index side — only the (small)
    * batch is ever re-shingled. Verification touches candidate pairs
    * only, with 8-byte hash-set elements, never document text. */
  def minhashLshJoin(left: DataFrame, right: DataFrame, textCol: String,
                     idCol: String, blockCol: String, n: Int,
                     numHashes: Int, bands: Int,
                     threshold: Double): DataFrame = {
    val lIn = graft.ops.Parallelize.forCompute(left)
    val rIn = graft.ops.Parallelize.forCompute(right)
    val lb = lshBandRows(lIn, textCol, idCol, blockCol, n, numHashes, bands)
      .withColumnRenamed("id", "id_l")
    val rb = lshBandRows(rIn, textCol, idCol, blockCol, n, numHashes, bands)
      .withColumnRenamed("id", "id_r")
    val candidates = lb.join(rb, Seq("block", "band_idx", "bk"))
      .select(col("id_l"), col("id_r")).distinct()
    def sets(in: DataFrame, idAs: String) = in.select(
      col(idCol).as(idAs), array_sort(wordShingleHashes(col(textCol), n)).as(s"ss_$idAs"))
    candidates
      .join(sets(lIn, "id_l"), Seq("id_l"))
      .join(sets(rIn, "id_r"), Seq("id_r"))
      .select(col("id_l"), col("id_r"),
        (size(array_intersect(col("ss_id_l"), col("ss_id_r"))).cast("double") /
         (size(col("ss_id_l")) + size(col("ss_id_r")) -
          size(array_intersect(col("ss_id_l"), col("ss_id_r"))))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Absolute per-shingle pair budget for the guarded pair plane's
    * ([[guardedJaccardPairs]] / [[guardedSimilarityStats]]) exact
    * tier (the q141 `maxBlock` discipline applied to the shingle plane):
    * a posting list at the budget expands to at most B·(B−1)/2 ≈ 2k
    * in-row pairs, and total exact-tier candidate volume is bounded by
    * (B/2)·postings — LINEAR in the corpus for a fixed budget, never
    * quadratic. Deliberately an absolute row budget, not corpus-
    * relative: under a closed vocabulary every shingle's df grows
    * linearly with the corpus, so any relative cap (mean, quantile)
    * grows with it and silently re-admits the k² blowup. Measured on
    * the shipped fixtures (round 14): max (lang, shingle) df is 5 at
    * sf0.01, 14 at sf0.1, 62 at sf1 — the exact tier is COMPLETE (the
    * guarded output equals plain exact jaccard) through sf1 — and min
    * df is 86 at sf10, where the uncapped plane is 2.94×10⁹ in-row
    * pairs (the measured 617 s / ENOSPC family) and the routed LSH
    * tier takes over. */
  val PairDfBudget: Int = 64

  /** MinHash-LSH band candidates with the UNFILTERED full-universe
    * verification triple (ic, da, db) — [[minhashLshPairs]]' candidate
    * plane emitting the raw measures instead of pre-filtered jaccard,
    * so a caller can apply any pair measure (jaccard, containment,
    * dice) to the SAME candidate set. Candidate volume is bounded by
    * the banding design (a hot band bucket means near-identical
    * signatures — a dup cluster, not corpus-sized); verification is
    * per-candidate array_intersect over 8-byte shingle-hash sets. */
  private def minhashLshPairStats(docs: DataFrame, textCol: String,
                                  idCol: String, blockCol: String, n: Int,
                                  numHashes: Int, bands: Int): DataFrame = {
    val in = graft.ops.Parallelize.forCompute(docs)
    val bandLists = lshBandRows(in, textCol, idCol, blockCol, n,
                                numHashes, bands)
      .groupBy(col("block"), col("band_idx"), col("bk"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val candidates = listPairs(bandLists, "ids")
      .select(col("pa").as("id_a"), col("pb").as("id_b")).distinct()
    val sets = in.select(col(idCol).as("id"),
      array_sort(wordShingleHashes(col(textCol), n)).as("ss"))
    candidates
      .join(sets.select(col("id").as("id_a"), col("ss").as("sa")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("ss").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("ic"),
        size(col("sa")).cast("long").as("da"),
        size(col("sb")).cast("long").as("db"))
  }

  /** GUARDED near-dup pairs — the [[blockedLinkage]] routing-guard
    * precedent applied to the shingle pair plane (VERDICT r13 #1/#2:
    * the uncapped plane measured 175× for 10× data on q52 and ENOSPC'd
    * five other consumers at sf10 — 2.94×10⁹ in-row pairs once every
    * posting list under the fixtures' closed 31-word vocabulary turns
    * hot). Two tiers, each bounded, each cheap in the regime where the
    * other is load-bearing:
    *
    *  - EXACT TIER: [[ngramJaccardPairs]] at `maxDf = dfBudget` — the
    *    proven two-shuffle counting plane, scoring exact jaccard over
    *    the df-capped universe (consistent-cap semantics: hot shingles
    *    leave intersections AND denominators). While the budget does
    *    not bind this IS plain exact jaccard (all shipped fixtures
    *    through sf1 — max (lang,shingle) df 62 ≤ 64); at sf10 every
    *    posting list is hot (min df 86) and the tier costs only its
    *    linear correction aggregates, emitting nothing.
    *  - ROUTED TIER: [[minhashLshPairStats]] candidates verified with
    *    FULL-universe exact jaccard at the same threshold, anti-joined
    *    against the exact tier's (already filtered, near-dup-sized)
    *    output so each pair reports once, exact tier preferred.
    *
    * Union semantics, mirrored term-for-term by the oracle's
    * `guardedPairsSql` CTE: a pair qualifies iff its capped-universe
    * jaccard clears `threshold` OR it is an LSH candidate whose
    * full-universe jaccard clears it. Through every oracle-checked SF
    * (≤ sf1) the output is bit-identical to the old uncapped plane;
    * beyond, recall is the LSH tier's own measured figure (q96's
    * sampled self-cert, 0.987 at the q22 parameters) with precision
    * 1.0 — every emitted pair verified exactly in whichever universe
    * its tier declares.
    *
    * Why not verify ALL candidates against full shingle sets: at sf1
    * the under-budget candidate set is the whole dense pair graph
    * (26.7M pairs), and carrying two ~54-element arrays per candidate
    * through the verify join measured 22.3 s vs 6.8 s for the counting
    * plane (Prof10); the counting tier keeps the narrow-row shuffle
    * and the array join touches only band candidates. */
  def guardedJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                          blockCol: String, n: Int, threshold: Double,
                          dfBudget: Int = PairDfBudget,
                          numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val lists = shingleLists(docs, textCol, idCol, blockCol, n, dfBudget)
    val exact = shinglePairStatsFromLists(lists, dfBudget)
      .select(col("id_a"), col("id_b"),
        (col("ic").cast("double") / (col("da") + col("db") - col("ic")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // RUNTIME TIER SKIP (round 14, the AQE adapt-on-materialized-stats
    // idea): when NO posting list exceeds the budget — a metadata-cheap
    // probe on the already-checkpointed list table — the exact tier is
    // provably COMPLETE (any pair with jaccard ≥ t > 0 shares a
    // shingle, and every shingle is under budget, so the pair is in
    // the exact tier with its full-universe measures) and the LSH
    // tier's anti-joined contribution is provably EMPTY; skip its
    // whole plane. Output identical by the proof, so the oracle's
    // unconditional two-tier UNION needs no flag.
    val capBinds = threshold <= 0.0 ||
      lists.filter(size(col("ids")) > dfBudget).limit(1).count() > 0
    if (!capBinds) return exact
    val lsh = minhashLshPairStats(docs, textCol, idCol, blockCol, n,
                                  numHashes, bands)
      .select(col("id_a"), col("id_b"),
        (col("ic").cast("double") / (col("da") + col("db") - col("ic")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    exact.unionByName(
      lsh.join(exact.select(col("id_a"), col("id_b")),
               Seq("id_a", "id_b"), "left_anti"))
  }

  /** Guarded twin of [[pairSimilarityStats]] (q121): the exact tier is
    * the capped counting plane (both measures over the df-capped
    * universe — plain exact while the budget does not bind), the routed
    * tier applies the SAME jaccard-OR-containment selection to the
    * full-universe measures of the LSH candidates, anti-joined so each
    * pair reports once with its tier's measures. Same union semantics
    * and recall contract as [[guardedJaccardPairs]]; the containment
    * direction additionally leans on the exact tier (the LSH bands are
    * jaccard-tuned — a short-in-long quote pair has tiny jaccard), so
    * at open scale the full containment certificate remains the
    * winnowed MOSS join (q101/q102). */
  def guardedSimilarityStats(docs: DataFrame, textCol: String, idCol: String,
                             blockCol: String, n: Int,
                             jaccardThreshold: Double,
                             containmentThreshold: Double,
                             dfBudget: Int = PairDfBudget,
                             numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val lists = shingleLists(docs, textCol, idCol, blockCol, n, dfBudget)
    val exact = shinglePairStatsFromLists(lists, dfBudget)
      .select(col("id_a"), col("id_b"), col("ic").as("n_shared"),
        (col("ic").cast("double") / (col("da") + col("db") - col("ic")))
          .as("jaccard"),
        (col("ic").cast("double") / col("da")).as("cont_a"),
        (col("ic").cast("double") / col("db")).as("cont_b"))
      .filter(col("jaccard") >= jaccardThreshold ||
              greatest(col("cont_a"), col("cont_b")) >= containmentThreshold)
    // same runtime tier skip as guardedJaccardPairs: a qualifying pair
    // has n_shared ≥ 1 (both selection measures are positive-threshold
    // ratios of ic), so a never-binding budget makes the exact tier
    // complete and the LSH recovery provably empty
    val capBinds = jaccardThreshold <= 0.0 || containmentThreshold <= 0.0 ||
      lists.filter(size(col("ids")) > dfBudget).limit(1).count() > 0
    if (!capBinds) return exact
    val lsh = minhashLshPairStats(docs, textCol, idCol, blockCol, n,
                                  numHashes, bands)
      .select(col("id_a"), col("id_b"), col("ic").as("n_shared"),
        (col("ic").cast("double") / (col("da") + col("db") - col("ic")))
          .as("jaccard"),
        (col("ic").cast("double") / col("da")).as("cont_a"),
        (col("ic").cast("double") / col("db")).as("cont_b"))
      .filter(col("jaccard") >= jaccardThreshold ||
              greatest(col("cont_a"), col("cont_b")) >= containmentThreshold)
    exact.unionByName(
      lsh.join(exact.select(col("id_a"), col("id_b")),
               Seq("id_a", "id_b"), "left_anti"))
  }

  /** Adds a per-row MinHash signature column (`array<long>` of
    * `numHashes` values, the h1 + j·h2 double-hashed family) computed
    * ENTIRELY IN-ROW via higher-order functions — no shuffle, no
    * explode: the formulation a STREAM can evaluate statelessly per
    * document (the groupBy formulation in [[lshBandRows]] needs an
    * aggregation exchange a continuous pipeline cannot re-run).
    * Identical values to the batch signature: min over the in-row
    * shingle multiset = MIN over the exploded shingle rows. Computed by
    * the one-pass native [[graft.functions.MinhashSigExpr]] (tokenize →
    * window → md5 halves → running minima, inside whole-stage codegen);
    * the first formulation here — `transform(shingles, md5Halves60)`
    * then numHashes `array_min(transform(...))` lambdas — was
    * value-identical but evaluated interpreted with per-element
    * allocations (the winnowing lesson; NativeTextSpec pins the
    * equivalence). Docs with fewer than `n` tokens get an EMPTY
    * signature — filter on `size(sig) > 0`. */
  def withMinhashSig(docs: DataFrame, textCol: String, sigCol: String,
                     n: Int, numHashes: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.withColumn(sigCol, GraftColumnBridge.column(
      graft.functions.MinhashSigExpr(
        GraftColumnBridge.expression(col(textCol)), n, numHashes)))
  }

  /** Batch twin of the STREAMING near-dup suppressor
    * ([[graft.streaming.EventStreams.nearDupSuppressStream]]): per LSH
    * band bucket (block, band_idx, band-key), the first-arriving
    * document (min (`orderCol`, id)) is the bucket's REPRESENTATIVE;
    * every later document in the bucket emits a suppression candidate
    * (id, band_idx, rep_id, agreement), where agreement is the
    * fraction of the `numHashes` signature positions equal to the
    * rep's — the ingest-gate decision row (suppress when any band's
    * agreement clears the caller's threshold; bands that merely
    * collide on their slice report low agreement and are kept).
    *
    * Scale shape: signatures are in-row ([[withMinhashSig]]); the only
    * exchanges are the bucket-keyed rep aggregate (min_by — no window
    * sort) and the hits join back on the same bucket key. Per-doc
    * cost is fixed (bands rows of ~24 bytes); text never shuffles. */
  def nearDupSuppressBatch(docs: DataFrame, textCol: String, idCol: String,
                           blockCol: String, orderCol: String, n: Int,
                           numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rpb = numHashes / bands
    val base = withMinhashSig(
        docs.select(col(idCol).as("id"), col(blockCol).as("block"),
                    col(orderCol).as("ord"), col(textCol).as("__text")),
        "__text", "sig", n, numHashes)
      .filter(size(col("sig")) > 0)
      .drop("__text")
    val banded = base.select(col("id"), col("block"), col("ord"), col("sig"),
        posexplode(array((0 until bands).map { b =>
          concat_ws("|", (b * rpb until (b + 1) * rpb)
            .map(j => element_at(col("sig"), j + 1).cast("string")): _*)
        }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bk")
    val reps = banded.groupBy(col("block"), col("band_idx"), col("bk"))
      .agg(min_by(struct(col("id").as("rid"), col("sig").as("rsig")),
                  struct(col("ord"), col("id"))).as("rep"))
      .select(col("block"), col("band_idx"), col("bk"),
              col("rep.rid").as("rep_id"), col("rep.rsig").as("rep_sig"))
    banded.join(reps, Seq("block", "band_idx", "bk"))
      .filter(col("id") =!= col("rep_id"))
      .select(col("id"), col("band_idx"), col("rep_id"),
        (size(filter(zip_with(col("sig"), col("rep_sig"), (a, b) => a === b),
                     x => x)).cast("double") / lit(numHashes.toDouble)).as("agreement"))
  }

  /** Sub-document dedup (the C4/Falcon "line dedup" analogue for
    * unpunctuated text): documents split into disjoint `segLen`-token
    * segments; a segment occurring >= `minRep` times corpus-wide is
    * boilerplate and removed from EVERY document; each document
    * reassembles from its surviving segments in order.
    *
    * Scale shape: segment frequency groups on the 60-bit portable hash
    * (8-byte shuffle keys, never segment strings); the hot-segment set
    * is tiny by construction (only repeated segments), so the removal
    * anti-join broadcasts under AQE. Output: (doc_id, n_tokens,
    * n_kept_segments, clean_text) for every input document — a fully
    * boilerplate document survives with empty text. */
  def segmentDedup(docs: DataFrame, textCol: String, idCol: String,
                   segLen: Int = 10, minRep: Int = 2): DataFrame = {
    require(segLen > 0 && minRep > 1, "segLen must be positive, minRep > 1")
    val w = tokens(col(textCol))
    val nseg = ceil(size(w).cast("double") / segLen).cast("int")
    // posexplode_OUTER keeps a (null, null) row for blank docs, so every
    // document flows through the single segment stream — no separate
    // corpus pass (and no final join) just to restore doc-level rows.
    // The empty-array guard matters: sequence(0, -1) would COUNT DOWN
    // (Spark infers a negative step), fabricating segments for blanks.
    val segRows = docs.select(col(idCol).as("doc_id"),
        tokenCount(col(textCol)).as("n_tokens"),
        posexplode_outer(when(size(w) === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), nseg - 1),
            i => concat_ws(" ", slice(w, i * lit(segLen) + lit(1), lit(segLen)))))))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "sg")
      .withColumn("h", portableHash(col("sg"), 13))
    val hot = segRows.filter(col("sg").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minRep).select(col("h"), lit(1).as("is_hot"))
    // hit-marker left join instead of an anti-join: a fully-boilerplate
    // doc keeps its rows (marked hot) and correctly survives with empty
    // text. The hot set is small by construction → AQE broadcasts; a
    // pathological corpus degrades to a shuffle join, not an error.
    segRows.join(hot, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
           count(when(col("is_hot").isNull && col("sg").isNotNull, lit(1)))
             .cast("long").as("n_kept_segments"),
           // null entries (hot or blank) vanish: collect_list skips null
           // structs and concat_ws skips null strings
           concat_ws(" ", transform(array_sort(collect_list(
             when(col("is_hot").isNull, struct(col("i"), col("sg"))))),
             p => p.getField("sg"))).as("clean_text"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept_segments"),
              col("clean_text"))
  }

  /** Exact repeated-substring-span removal (the ExactSubstr dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" — behavior class, not code): every overlapping
    * `winLen`-token window is hashed; a window whose hash occurs >=
    * `minRep` times corpus-wide (counting every position, within- AND
    * cross-document) marks its span [i, i+winLen) as duplicated; per
    * document the marked spans merge into maximal intervals
    * (adjacent-or-overlapping collapse, the interval-union semantics),
    * and the surviving tokens reassemble in order. Unlike
    * [[segmentDedup]]'s disjoint fixed segments this catches repeats at
    * ANY alignment — the canonical training-data substring dedup.
    *
    * Scale shape (100 TB): the window stream is one row per token
    * position — the corpus token stream, the same cardinality the q21
    * posting lists handle; frequency groups on the 60-bit portable hash
    * (8-byte shuffle keys, never window strings); duplicated positions
    * are a small fraction by construction, so the mark-back semi-join
    * broadcasts under AQE; interval merging windows BY DOCUMENT
    * (bounded by document length, never a corpus-wide sort); the final
    * span strip is a positional array filter against each doc's few
    * merged intervals — map-side, no kept-token explode. */
  def spanDedup(docs: DataFrame, textCol: String, idCol: String,
                winLen: Int = 15, minRep: Int = 2): DataFrame = {
    require(winLen > 0 && minRep > 1, "winLen must be positive, minRep > 1")
    import org.apache.spark.sql.expressions.Window
    val win = docs.select(col(idCol).as("doc_id"),
        posexplode(wordNgrams(col(textCol), winLen)))
      .select(col("doc_id"), col("pos").as("i"),
              portableHash(col("col"), 29).as("h"))
    val hot = win.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minRep).select(col("h"))
    val hit = win.join(hot, Seq("h"), "left_semi")
    // consecutive hot positions <= winLen apart overlap-or-touch, so
    // they union into one contiguous interval: island starts where the
    // gap to the previous hot position exceeds the window length
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val isl = hit
      .withColumn("st", when(lag(col("i"), 1).over(byDoc).isNull ||
             col("i") > lag(col("i"), 1).over(byDoc) + winLen, 1L)
        .otherwise(0L))
      .withColumn("isle", sum(col("st")).over(byDoc))
    val ivs = isl.groupBy(col("doc_id"), col("isle"))
      .agg(min(col("i")).as("s"), (max(col("i")) + winLen).as("e"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("s"), col("e")))).as("ivs"),
           count(lit(1)).cast("long").as("n_spans"),
           sum(col("e") - col("s")).cast("long").as("n_removed_tokens"))
      .withColumnRenamed("doc_id", "__sd_id")
    val w = tokens(col(textCol))
    docs.join(ivs, docs(idCol) === col("__sd_id"), "left")
      .select(docs(idCol).as("doc_id"),
        tokenCount(col(textCol)).as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed_tokens"), lit(0L)).as("n_removed_tokens"),
        concat_ws(" ", filter(w, (tok, idx) =>
          coalesce(!exists(col("ivs"), iv =>
            idx >= iv.getField("s") && idx < iv.getField("e")), lit(true))))
          .as("clean_text"))
  }

  /** Number of SimHash bits (portableHash yields 60 usable bits). */
  val SimHashBits = 60

  /** Number of LSH bands the fingerprint splits into (15 bits each). */
  val SimHashBands = 4

  /** SimHash fingerprint per document: for each bit position, sum +1/-1
    * votes of each token's hash bit; bit set iff the vote is positive.
    * Expressed as 60 conditional-sum aggregates + a bit-recombine — one
    * shuffle, fully codegen'd, no UDAF. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = graft.ops.Parallelize.forCompute(docs)
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", portableHash(col("t"), 7))
    val votes = (0 until SimHashBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i")
    }
    val agg = tok.groupBy(col("id")).agg(votes.head, votes.tail: _*)
    val fp = (0 until SimHashBits).map { i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs within a block: hamming distance ≤ maxDist,
    * via an O(block²) bit_count(xor) comparison. Suitable when blocks
    * are bounded (e.g. pre-bucketed shards); at open scale use
    * [[simhashPairsBanded]]. */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   blockCol: String, maxDist: Int): DataFrame = {
    val fp = simhashWithBlock(docs, textCol, idCol, blockCol)
    val a = fp.select(col("id").as("id_a"), col("block"), col("simhash").as("fa"))
    val b = fp.select(col("id").as("id_b"), col("block"), col("simhash").as("fb"))
    a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** SimHash near-dup pairs at open scale: the 60-bit fingerprint is
    * banded into [[SimHashBands]]×15-bit LSH keys; a pair is a
    * candidate iff it shares a band (within the block), then candidates
    * are verified by exact hamming distance. For maxDist < SimHashBands
    * the banding is LOSSLESS (pigeonhole: ≤3 differing bits across 4
    * bands leave ≥1 band identical), so this returns exactly the
    * [[simhashPairs]] result while the candidate join touches only
    * same-band groups — never O(block²). */
  def simhashPairsBanded(docs: DataFrame, textCol: String, idCol: String,
                         blockCol: String, maxDist: Int): DataFrame = {
    require(maxDist < SimHashBands,
      s"banding into $SimHashBands bands is only exact for maxDist < $SimHashBands")
    val bandBits = SimHashBits / SimHashBands // 15
    val fp = simhashWithBlock(docs, textCol, idCol, blockCol)
    val bandRows = fp.select(col("id"), col("block"), col("simhash"),
        posexplode(array((0 until SimHashBands).map { b =>
          shiftright(col("simhash"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1))
        }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bk")
    val bandLists = bandRows
      .groupBy(col("block"), col("band_idx"), col("bk"))
      .agg(array_sort(collect_list(struct(col("id"), col("simhash")))).as("ids"))
      .filter(size(col("ids")) > 1)
    listPairs(bandLists, "ids")
      .select(col("pa.id").as("id_a"), col("pa.simhash").as("fa"),
              col("pb.id").as("id_b"), col("pb.simhash").as("fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Hamming-near pairs over a PRECOMPUTED 64-bit fingerprint column —
    * [[simhashPairsBanded]]'s LSH machinery generalized so other
    * fingerprint planes (image dHash/aHash, audio chromaprints) reuse it
    * (VERDICT r10 #3). The fingerprint is banded into `bands` equal
    * slices; a pair is a candidate iff it shares a band, then verified
    * by exact hamming distance. Pigeonhole: maxDist < bands differing
    * bits leave ≥1 band identical, so the banding is LOSSLESS — this
    * returns exactly the O(n²) comparison's result while the candidate
    * join only touches same-band groups. One shuffle on the band keys;
    * candidate verification is in-row. */
  def hammingPairsBanded(rows: DataFrame, idCol: String, fpCol: String,
                         maxDist: Int, bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands=$bands must divide 64")
    require(maxDist >= 0 && maxDist < bands,
      s"banding into $bands bands is only exact for maxDist < $bands")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val bandRows = rows.select(col(idCol).as("id"), col(fpCol).as("fp"),
        posexplode(array((0 until bands).map { b =>
          shiftright(col(fpCol), b * bandBits).bitwiseAND(lit(mask))
        }: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bk")
    val bandLists = bandRows
      .groupBy(col("band_idx"), col("bk"))
      .agg(array_sort(collect_list(struct(col("id"), col("fp")))).as("ids"))
      .filter(size(col("ids")) > 1)
    listPairs(bandLists, "ids")
      .select(col("pa.id").as("id_a"), col("pa.fp").as("fa"),
              col("pb.id").as("id_b"), col("pb.fp").as("fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Contiguous fixed-width band keys over a slice of `name`:
    * band b = substring(name, start + b*width, width) (1-based start,
    * SQL substring convention). The string-layer sibling of
    * [[hammingPairsBanded]]'s bit bands, with the same pigeonhole
    * guarantee: two equal-length names whose differing characters fall
    * inside the banded slice and touch at most `bands - 1` bands agree
    * exactly on at least one band — so a band-bucket join is LOSSLESS
    * for pairs within `bands - 1` character edits of the slice
    * (2 edits under the default 3 bands; a transposition counts 2). */
  def suffixBands(name: Column, start: Int, width: Int, bands: Int): Seq[Column] = {
    require(bands > 0 && width > 0 && start > 0,
      s"bad band grid: start=$start width=$width bands=$bands")
    (0 until bands).map(b => substring(name, start + b * width, width))
  }

  /** Blocked record linkage with the OVERSIZED-BLOCK ROUTING GUARD —
    * the operator the q141 docstring promised and round 11's sf1 run
    * made concrete (fixed 125-block key → per-block quadratic → 87 s /
    * ~90M scored pairs at sf1): per-block cardinality is measured in
    * ONE cheap aggregate, blocks at or under `maxBlock` pair
    * exhaustively (the exact tier — a per-block-bounded equi-join,
    * never a cartesian), and oversized blocks are DIVERTED to a banded
    * candidate plane (the q22 LSH shape with deterministic substring
    * bands from `bandsOf` instead of MinHash, so the DuckDB oracle can
    * re-derive the identical candidate set): rows bucket on
    * (block, band_idx, band_key), only bucket-mates become candidates,
    * and a multi-band pair is deduplicated before scoring. Candidate
    * volume per oversized block drops from n²/2 to Σ bucket² per band
    * (~n²·bands/|band-key-space| under uniform keys — 333× fewer for
    * the 3×3-digit default on 9-digit suffixes).
    *
    * HOT BAND BUCKETS get the q21 df-cap treatment, with the SAME cap:
    * a band bucket larger than the block cap is a quadratic unit as bad
    * as the block the guard refused to pair, so it is removed from the
    * candidate universe entirely (low-entropy band positions — e.g. the
    * constant "Customer#000…" prefix region of the fixture names —
    * otherwise rebuild the full block quadratic inside one bucket).
    * This yields the PROVABLE bound that makes the guard a guard:
    * every scored unit is a block ≤ cap or a bucket ≤ cap, and there
    * are at most `bands`·n bucket memberships, so candidate volume is
    * O(n · bands · maxBlock) — linear in the corpus for a fixed cap,
    * never quadratic, regardless of how degenerate the key space is.
    *
    * Recall contract of the routed tier: lossless by pigeonhole for
    * pairs within `bands-1` character edits of the banded slice (see
    * [[suffixBands]]) PROVIDED an agreeing band's bucket is within the
    * cap; beyond that it is a candidate generator whose recall the
    * engine measures itself (q231, the q96 pattern). When every block
    * is within `maxBlock` the output is EXACTLY the plain blocked
    * all-pairs join (property-tested, routed tier empty).
    *
    * Scale notes: the block-count table is block-key-cardinality-sized
    * and broadcast here (the bounded-block-vocabulary regime — 125 keys
    * for q141; swap the broadcast for a shuffle join when the blocking
    * key scales with the corpus, e.g. name prefixes). `maxBlock` is an
    * ABSOLUTE row budget, deliberately not corpus-relative: under a
    * fixed-cardinality key, block sizes grow linearly with the corpus,
    * so any relative cap (mean, quantile) grows with them and silently
    * re-admits the quadratic — a mean cap at sf1 keeps ~half of q141's
    * 90M-pair blowup in the "bounded" tier. A cap is a budget per
    * scored unit; budgets do not scale with the data.
    *
    * Output: (id_a, name_a, id_b, name_b, routed) with id_a < id_b;
    * `routed` marks pairs from the candidate plane. Scoring/threshold
    * stay with the caller — the guard is about WHICH pairs get scored. */
  def blockedLinkage(rows: DataFrame, idCol: String, nameCol: String,
                     blockCols: Seq[String], maxBlock: Long,
                     bandsOf: Column => Seq[Column]): DataFrame = {
    require(blockCols.nonEmpty, "blocked linkage needs at least one block column")
    require(maxBlock >= 2, s"maxBlock=$maxBlock cannot pair anything")
    val bc = blockCols.map(col)
    val counts = rows.groupBy(bc: _*).agg(count(lit(1)).as("block_n"))
    val tagged = rows.select(bc :+ col(idCol).as("lk_id") :+ col(nameCol).as("lk_nm"): _*)
      .join(broadcast(counts), blockCols)
      .withColumn("block_cap", lit(maxBlock))
    // exact tier: bounded blocks pair exhaustively (hash equi-join)
    val small = tagged.filter(col("block_n") <= col("block_cap"))
    val exactPairs = small.select(bc :+ col("lk_id").as("id_a") :+ col("lk_nm").as("name_a"): _*)
      .join(small.select(bc :+ col("lk_id").as("id_b") :+ col("lk_nm").as("name_b"): _*), blockCols)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("name_a"), col("id_b"), col("name_b"),
              lit(false).as("routed"))
    // routed tier: oversized blocks go through band buckets
    val big = tagged.filter(col("block_n") > col("block_cap"))
    val bandRows = big.select(
        bc :+ col("lk_id") :+ col("lk_nm") :+ col("block_cap") :+
          posexplode(array(bandsOf(col("lk_nm")): _*)): _*)
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bk")
    val bandLists = bandRows
      .groupBy(bc :+ col("band_idx") :+ col("bk"): _*)
      .agg(array_sort(collect_list(struct(col("lk_id").as("id"), col("lk_nm").as("nm"))))
        .as("ids"),
        min(col("block_cap")).as("bcap")) // cap is a global constant; min = pass-through
      .filter(size(col("ids")) > 1 && size(col("ids")) <= col("bcap"))
    val cand = listPairs(bandLists, "ids")
      .select(col("pa.id").as("id_a"), col("pa.nm").as("name_a"),
              col("pb.id").as("id_b"), col("pb.nm").as("name_b"))
      .distinct()
      .withColumn("routed", lit(true))
    exactPairs.unionByName(cand)
  }

  private def simhashWithBlock(docs: DataFrame, textCol: String,
                               idCol: String, blockCol: String): DataFrame =
    simhash(docs, textCol, idCol)
      .join(docs.select(col(idCol).as("id"), col(blockCol).as("block")), "id")

  /** Near-dup pairs → keep/drop groups: connected components. Every doc
    * appearing in `pairs` gets (doc_id, group_rep) where group_rep =
    * the minimum doc id reachable through the pair graph; a
    * training-data pipeline keeps `doc_id == group_rep` and drops the
    * rest.
    *
    * ADAPTIVE between two execution strategies, decided from the
    * MATERIALIZED edge count (the pairs input is checkpointed first, so
    * the probe is a metadata-cheap count — the same adapt-on-runtime-
    * stats idea AQE applies to join strategies):
    *
    *  - pair graph fits on the driver (≤ maxDriverEdges, default 4M
    *    edges ≈ 64 MB as primitive arrays; the transient collected
    *    tuple array costs ~40 bytes/edge ≈ 160 MB before the copy —
    *    both well inside a driver heap, the spirit of the
    *    broadcast-join threshold):
    *    collect the edge list and run exact union-find with min-root
    *    union and path compression — one collect job instead of ~4
    *    Spark jobs per propagation round, and the result is a
    *    LocalRelation that downstream joins (q52-style apply) can
    *    broadcast. Near-dup pair sets are SMALL relative to the corpus
    *    (they are the output of a similarity threshold, not the corpus
    *    itself), so this is the common case even at large corpus scale.
    *  - otherwise: distributed iterative min-label propagation with
    *    pointer jumping ([[dedupGroupsDistributed]]) — unbounded scale,
    *    O(log diameter) rounds.
    *
    * Both strategies compute the identical fixpoint (min reachable id),
    * deterministic under any partitioning. */
  def dedupGroups(pairs: DataFrame, aCol: String, bCol: String,
                  maxIter: Int = 25,
                  maxDriverEdges: Long = 4L * 1024 * 1024): DataFrame = {
    // checkpoint BEFORE anything else: the count probe, the union's two
    // branches, and every propagation round all read the same (possibly
    // expensive — e.g. a full near-dup computation) pairs subtree, and
    // plan-level reuse across union branches is not guaranteed, so
    // materialize it once. Null-id edges are dropped up front: the two
    // strategies would otherwise diverge (equi-joins silently skip null
    // keys while the driver path would fail on them), and a null doc id
    // is not a node.
    val half = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    if (integralEdgeTypes(half) && half.count() <= maxDriverEdges)
      dedupGroupsLocal(half)
    else dedupGroupsDistributed(half, maxIter)
  }

  /** The driver paths round-trip ids through Long and cast the result
    * back to the id type, so they are taken only when BOTH columns are
    * the SAME integral type — a mixed (int, long) edge list would wrap
    * or null ids on the cast-back where the distributed path would
    * widen correctly, breaking the identical-fixpoint contract. */
  private def integralEdgeTypes(half: DataFrame): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val (st, dt) = (half.schema("src").dataType, half.schema("dst").dataType)
    st == dt && Seq(ByteType, ShortType, IntegerType, LongType).contains(st)
  }

  /** Driver-side exact union-find over a bounded, already-materialized
    * edge list. Union-by-min keeps every root the component minimum, so
    * find() after all unions yields the same representative the
    * distributed fixpoint computes. */
  /** Collect a bounded (src, dst) edge frame into primitive long
    * arrays — as specialized Tuple2[Long, Long] (~40 bytes/edge
    * transient — object header + two unboxed fields + array ref), then
    * copied so the tuples go; an Array[Row] of GenericRows would cost
    * ~100 bytes/edge. */
  private def collectEdges(half: DataFrame): (Array[Long], Array[Long]) = {
    val spark = half.sparkSession
    val tupled = {
      import spark.implicits._
      half.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].collect()
    }
    val srcs = new Array[Long](tupled.length)
    val dsts = new Array[Long](tupled.length)
    var k = 0
    while (k < tupled.length) { srcs(k) = tupled(k)._1; dsts(k) = tupled(k)._2; k += 1 }
    (srcs, dsts)
  }

  /** Exact union-find with min-root union and path compression over a
    * collected edge list; the returned `find` yields each node's
    * component MINIMUM — the same fixpoint the distributed min-label
    * propagation computes. Shared by [[dedupGroupsLocal]] and
    * [[hopsToRepLocal]]. */
  private def unionFindMin(srcs: Array[Long],
                           dsts: Array[Long]): Long => Long = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    var e = 0
    while (e < srcs.length) {
      val (ra, rb) = (find(srcs(e)), find(dsts(e)))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      e += 1
    }
    find
  }

  private def dedupGroupsLocal(half: DataFrame): DataFrame = {
    val spark = half.sparkSession
    val srcType = half.schema("src").dataType
    val (srcs, dsts) = collectEdges(half)
    val find = unionFindMin(srcs, dsts)
    val nodes = (srcs.iterator ++ dsts.iterator).toArray.distinct
    // materialize as a genuine LocalRelation (NOT sparkContext
    // .parallelize, which plans as an RDD scan with unknown stats):
    // LocalRelation carries exact row counts, so downstream joins of
    // the group table (q52-style apply) plan as broadcasts statically
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(
        nodes.map(n => org.apache.spark.sql.Row(n, find(n))): _*)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("group_rep",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
      .select(col("doc_id").cast(srcType).as("doc_id"),
              col("group_rep").cast(srcType).as("group_rep"))
  }

  /** Distributed connected components: iterative min-label propagation
    * WITH pointer jumping, for pair graphs too large to collect.
    *
    * Each round: (1) propagate — every node takes the min of its own
    * and its neighbors' labels; (2) shortcut (pointer jumping) — every
    * node also takes its label's label. The shortcut halves remaining
    * chain lengths each round, so convergence is O(log diameter) —
    * maxIter=25 covers graphs with diameter beyond 10⁶ (near-dup
    * graphs are near-cliques that settle in 2-3 rounds anyway).
    * `localCheckpoint` truncates lineage so the plan stays
    * constant-size across rounds. The fixpoint is the min reachable id
    * — deterministic under any partitioning.
    *
    * Throws IllegalStateException if the fixpoint is not reached within
    * maxIter rounds — unconverged labels are silently WRONG groupings
    * (a q52-style apply would keep several representatives of one
    * cluster), so refusing is the only safe behavior. */
  private[graft] def dedupGroupsDistributed(half: DataFrame,
                                            maxIter: Int): DataFrame = {
    val edges = half.union(half.select(col("dst"), col("src")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dst_label")), "dst")
        .groupBy(col("src")).agg(min(col("dst_label")).as("nbr_label"))
      val prelim = labels
        .join(nbrMin.select(col("src").as("id"), col("nbr_label")), Seq("id"), "left")
        .select(col("id"),
                least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      // pointer jumping: follow one hop through the label table itself
      val next = prelim
        .join(prelim.select(col("id").as("lid"), col("label").as("llabel")),
              col("label") === col("lid"), "left")
        .select(col("id"),
                least(col("label"), coalesce(col("llabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      // convergence probe: any label that still shrank this round?
      val changed = next
        .join(labels.select(col("id"), col("label").as("prev")), "id")
        .filter(col("label") < col("prev")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"dedupGroups: min-label propagation did not converge in $maxIter rounds " +
        "- raise maxIter (labels at this point would be silently wrong groupings)")
    labels.select(col("id").as("doc_id"), col("label").as("group_rep"))
  }

  /** BFS hop distance from every pair-graph node to its cluster
    * representative (q184) — the dedup-QA readout on top of
    * [[dedupGroups]]: hops == 1 is a direct near-dup of the kept doc,
    * larger hops survive only through TRANSITIVE chains, i.e. docs the
    * cluster absorbed without ever matching the representative
    * directly. A fat hops>=2 tail is the classic symptom of an
    * over-aggressive threshold chaining unrelated docs together.
    *
    * Frontier min-distance relaxation seeded at the representatives:
    * each round joins the edge list to the current distance table and
    * keeps the per-node minimum; BFS distances are unique, so the
    * fixpoint is deterministic under any partitioning, and convergence
    * takes diameter+1 rounds (near-dup clusters are near-cliques that
    * settle in 2-3). Same refuse-if-unconverged contract and
    * constant-plan-size checkpointing as [[dedupGroupsDistributed]];
    * every stage keys on node id — unbounded scale. */
  def hopsToRep(pairs: DataFrame, aCol: String, bCol: String,
                maxIter: Int = 20,
                maxDriverEdges: Long = 4L * 1024 * 1024): DataFrame = {
    val half = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    // ADAPTIVE like [[dedupGroups]] (round 14): a near-dup pair graph
    // under the driver-edge cap runs union-find AND the multi-source
    // BFS on the driver — ONE collect instead of ~5 grid-sized Spark
    // jobs per relaxation round (q184 paid ~15 sub-second jobs of pure
    // scheduling floor on a 158-row pair graph at sf0.1: 2.25 s in the
    // r14 pair run). Exact BFS distances are unique, so the driver
    // fixpoint is the distributed fixpoint; the refuse-if-beyond-
    // maxIter contract is kept bit-for-bit (a component whose diameter
    // the distributed form would not converge on within maxIter throws
    // the same error here).
    if (integralEdgeTypes(half) && half.count() <= maxDriverEdges)
      return hopsToRepLocal(half, maxIter)
    val groups = dedupGroups(half, "src", "dst")
    val edges = half.union(half.select(col("dst"), col("src")))
      .distinct().localCheckpoint(true)
    var dist = groups.select(col("group_rep").as("id")).distinct()
      .select(col("id"), lit(0L).as("hops")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nd = edges
        .join(dist.select(col("id").as("dst"), col("hops")), "dst")
        .select(col("src").as("id"), (col("hops") + lit(1L)).as("hops"))
      val next = dist.unionByName(nd)
        .groupBy(col("id")).agg(min(col("hops")).as("hops"))
        .localCheckpoint(true)
      val changed = next
        .join(dist.select(col("id"), col("hops").as("prev")), Seq("id"), "left")
        .filter(col("prev").isNull || col("hops") < col("prev"))
        .limit(1).count()
      dist = next
      converged = changed == 0
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"hopsToRep: BFS relaxation did not converge in $maxIter rounds " +
        "- raise maxIter (distances at this point would be silently wrong)")
    groups.join(dist.select(col("id").as("doc_id"), col("hops")), Seq("doc_id"))
  }

  /** Driver twin of [[hopsToRep]]'s relaxation for bounded pair graphs:
    * union-find for the representatives, then exact multi-source BFS
    * seeded at them over an adjacency map of the collected edges. BFS
    * distances are unique, so this is the identical fixpoint; the
    * distributed form converges at round (max hops + 1), so the same
    * refuse threshold applies. Returns a LocalRelation (downstream
    * joins broadcast statically, the dedupGroupsLocal rationale). */
  private def hopsToRepLocal(half: DataFrame, maxIter: Int): DataFrame = {
    val spark = half.sparkSession
    val srcType = half.schema("src").dataType
    val (srcs, dsts) = collectEdges(half)
    val find = unionFindMin(srcs, dsts)
    // dense-int CSR adjacency over primitive arrays (a boxed
    // LongMap[ArrayBuffer] at the 4M-edge cap costs hundreds of MB of
    // Long boxes on a driver heap the local-mode executors and the
    // bench table cache already occupy; the CSR form is ~16 bytes/edge
    // flat): remap node ids to [0, n), count-prefix-sum-fill.
    val nodes = (srcs.iterator ++ dsts.iterator).toArray.distinct
    val n = nodes.length
    val idx = scala.collection.mutable.LongMap.empty[Int]
    var i = 0
    while (i < n) { idx(nodes(i)) = i; i += 1 }
    val m = srcs.length
    val deg = new Array[Int](n)
    var e = 0
    while (e < m) { deg(idx(srcs(e))) += 1; deg(idx(dsts(e))) += 1; e += 1 }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val nbr = new Array[Int](2 * m)
    e = 0
    while (e < m) {
      val a = idx(srcs(e)); val b = idx(dsts(e))
      nbr(fill(a)) = b; fill(a) += 1
      nbr(fill(b)) = a; fill(b) += 1
      e += 1
    }
    val dist = new Array[Long](n)
    java.util.Arrays.fill(dist, -1L)
    var frontier = nodes.iterator.map(find).toArray.distinct.map(idx)
    frontier.foreach(r => dist(r) = 0L)
    var d = 0L
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ArrayBuffer.empty[Int]
      frontier.foreach { u =>
        var p = off(u)
        while (p < off(u + 1)) {
          val v = nbr(p)
          if (dist(v) < 0L) { dist(v) = d + 1L; next += v }
          p += 1
        }
      }
      frontier = next.toArray
      d += 1L
    }
    val maxHops = d - 1L // last round that added nodes
    if (maxHops + 1L > maxIter) throw new IllegalStateException(
      s"hopsToRep: BFS relaxation did not converge in $maxIter rounds " +
        "- raise maxIter (distances at this point would be silently wrong)")
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(
        nodes.zipWithIndex.map { case (nd, j) =>
          org.apache.spark.sql.Row(nd, find(nd), dist(j))
        }: _*)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("group_rep",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("hops",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
      .select(col("doc_id").cast(srcType).as("doc_id"),
              col("group_rep").cast(srcType).as("group_rep"),
              col("hops"))
  }
}
