package graft.ext

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-corpus pipelines (BASELINE.json north
  * star): exact, word-n-gram Jaccard, MinHash+LSH, SimHash. All are pure
  * DataFrame transforms built from codegen'd expressions; hashes are
  * `TextFunctions.portableHash` (md5-based) so every sketch is
  * reproducible in the DuckDB oracle.
  *
  * Scale design (100 TB documents):
  *  - exact dedup groups on a 60-bit fingerprint, not the full text, so
  *    the shuffle carries 8 bytes + doc_id per row;
  *  - candidate generation (LSH bands / shingle join) is blocked (e.g.
  *    by lang) and verified pairwise only on candidates — never an
  *    unblocked O(n²) cross join;
  *  - hot shingles (stopword n-grams) are the skew risk in the shingle
  *    join: AQE skew-join handles moderate skew, and the MinHash path
  *    avoids the problem entirely (bounded signature size per doc).
  */
object Dedup {

  /** Exact dedup: one representative (min id) per identical text.
    * Grouping key is the 60-bit fingerprint of the normalized text —
    * constant-width shuffle keys at any document size. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"),
           count(lit(1)).cast("long").as("n_dupes"))

  /** Per-document distinct word n-gram shingles, exploded to
    * (id, block, shingle) rows. */
  private def shingleRows(docs: DataFrame, textCol: String, idCol: String,
                          blockCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), col(blockCol).as("block"),
                explode(wordShingles(col(textCol), n)).as("s"))

  /** Near-dup pairs by exact word-n-gram Jaccard similarity, computed
    * via a shingle equi-join within `blockCol` blocks (a pair is only
    * compared if it shares ≥1 shingle AND the block). Returns
    * (id_a, id_b, jaccard) for pairs with jaccard ≥ threshold. */
  /** Exact all-pairs jaccard via the shingle-count join. Join keys are
    * 64-bit xxhash64 of the shingle — the self-join shuffle carries
    * 8-byte keys instead of strings (a 2^-64 cross-pair collision would
    * inflate one count; negligible and detectable as jaccard > 1).
    *
    * Note on alternatives: prefix filtering (join only the rare-first
    * prefix of each shingle set, then verify candidates) was measured
    * on this workload and LOST — the fixtures' small vocabulary makes
    * the pair-similarity graph dense, so candidates ≈ all pairs and
    * the per-pair set verification dominates. On a realistic corpus
    * (heavy-tailed shingle frequencies, sparse similarity) prefix
    * filtering wins; for guaranteed sub-quadratic behavior at 100 TB
    * use [[minhashLshPairs]].
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        blockCol: String, n: Int, threshold: Double): DataFrame = {
    val in = graft.ops.Parallelize.forCompute(docs)
    // pairs from per-shingle posting lists instead of a self-join: one
    // groupBy on (block, shingle) then in-row pair expansion — one full
    // shuffle of the shingle table FEWER than the equi-join (which
    // exchanges both sides), and the hot-shingle fan-out is explicit
    // (bounded in-row array work instead of join-row amplification).
    // Each doc's set size rides along into the posting list, so the
    // jaccard denominator needs NO per-doc count aggregate and NO join
    // back onto the pair table — the whole operator is exactly two
    // shuffles (posting-list groupBy + pair-count groupBy) at any scale.
    val sh = in.select(col(idCol).as("id"), col(blockCol).as("block"),
                       wordShingles(col(textCol), n).as("ss"))
      .select(col("id"), col("block"), size(col("ss")).as("n_sh"),
              explode(col("ss")).as("s"))
      .select(col("id"), col("block"), col("n_sh"), xxhash64(col("s")).as("sh"))
    val lists = sh.groupBy(col("block"), col("sh"))
      .agg(array_sort(collect_list(struct(col("id"), col("n_sh")))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairs = lists.select(explode(flatten(
      transform(sequence(lit(1), size(col("ids")) - 1), i =>
        transform(sequence(i + 1, size(col("ids"))), j =>
          struct(element_at(col("ids"), i).getField("id").as("id_a"),
                 element_at(col("ids"), i).getField("n_sh").as("na"),
                 element_at(col("ids"), j).getField("id").as("id_b"),
                 element_at(col("ids"), j).getField("n_sh").as("nb")))))).as("p"))
      .select(col("p.id_a"), col("p.na"), col("p.id_b"), col("p.nb"))
    pairs
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("ic"))
      .select(col("id_a"), col("id_b"),
              (col("ic").cast("double") / (col("na") + col("nb") - col("ic"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature entry: min over a doc's shingles of
    * portableHash(seed=j). */
  private def minhashCol(j: Int): Column = min(portableHash(col("s"), j)).as(s"mh$j")

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
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val in = graft.ops.Parallelize.forCompute(docs)
    val sh = shingleRows(in, textCol, idCol, blockCol, n)
    val sig = sh.groupBy(col("id"), col("block"))
      .agg(minhashCol(0), (1 until numHashes).map(minhashCol): _*)
    // band key: '|'-joined signature slice (portable to SQL string concat)
    val banded = sig.select(
      col("id") +: col("block") +: (0 until bands).map { b =>
        concat_ws("|",
          (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh$j")): _*)
          .as(s"band$b")
      }: _*)
    // ONE self-join over exploded (band_idx, signature) rows — a
    // per-band join union would reference the signature subtree 2×bands
    // times, and exchange reuse does not reliably deduplicate it (the
    // signature pipeline is the expensive part: hashes × shingles).
    val bandRows = banded.select(col("id"), col("block"),
        posexplode(array((0 until bands).map(b => col(s"band$b")): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "bk")
    // candidate pairs via posting lists on the band key (one groupBy
    // exchange) instead of a self-join (which exchanges both sides);
    // array_sort guarantees id_a < id_b in the in-row expansion
    val bandLists = bandRows.groupBy(col("block"), col("band_idx"), col("bk"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val candidates = bandLists.select(explode(flatten(
      transform(sequence(lit(1), size(col("ids")) - 1), i =>
        transform(sequence(i + 1, size(col("ids"))), j =>
          struct(element_at(col("ids"), i).as("id_a"),
                 element_at(col("ids"), j).as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
    // Verify ONLY the candidate pairs (this is the entire point of LSH:
    // never run pairwise verification over the full corpus). Each side's
    // distinct shingle set is attached to the pair as 64-bit hashes
    // (8-byte elements instead of strings — smaller broadcast/shuffle
    // and cheaper intersection; counts identical modulo 2^-64).
    val sets = in.select(col(idCol).as("id"),
      array_sort(transform(wordShingles(col(textCol), n), s => xxhash64(s))).as("ss"))
    val verified = candidates
      .join(sets.select(col("id").as("id_a"), col("ss").as("sa")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("ss").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
         (size(col("sa")) + size(col("sb")) -
          size(array_intersect(col("sa"), col("sb"))))).as("jaccard"))
    verified.filter(col("jaccard") >= threshold)
  }

  /** Number of SimHash bits (portableHash yields 60 usable bits). */
  val SimHashBits = 60

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

  /** SimHash near-dup pairs within a block: hamming distance ≤ maxDist.
    * Blocked O(block²) comparison via bit_count(xor) — suitable when
    * blocks are bounded; at open scale, band the fingerprint into
    * 4×15-bit keys first (same LSH trick as MinHash). */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   blockCol: String, maxDist: Int): DataFrame = {
    val withBlock = docs.select(col(idCol).as("id"), col(blockCol).as("block"))
    val fp = simhash(docs, textCol, idCol).join(withBlock, "id")
    val a = fp.select(col("id").as("id_a"), col("block"), col("simhash").as("fa"))
    val b = fp.select(col("id").as("id_b"), col("block"), col("simhash").as("fb"))
    a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }
}
