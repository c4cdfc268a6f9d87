package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** The guarded shingle pair plane (round 14, VERDICT r13 #1/#2): the
  * q141 routing-guard discipline applied to the q52-family — capped
  * counting exact tier, full-universe-verified LSH routed tier. */
class GuardedPairsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDocs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  describe("guarded jaccard pairs") {
    it("equals plain exact jaccard exactly while the df budget does not bind (sf0.01)") {
      // the recall contract's first half: budget not binding → the
      // guarded output IS the uncapped exact pair set, same jaccards
      val exact = Dedup.ngramJaccardPairs(fixtureDocs, "text", "doc_id",
          "lang", 3, 0.5, maxDf = Int.MaxValue)
        .as[(Long, Long, Double)].collect().toSet
      val guarded = Dedup.guardedJaccardPairs(fixtureDocs, "text", "doc_id",
          "lang", 3, 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(guarded == exact)
      assert(guarded.nonEmpty) // the fixture plants near-dups
    }

    it("matches its declared union semantics when the budget binds: capped-tier pairs ∪ LSH-verified pairs") {
      // budget 2 binds on nearly every fixture posting list; the
      // guarded output must equal the composition of its two public
      // tiers — capped-universe jaccard ≥ t pairs, plus full-universe-
      // verified LSH candidates — with no silent third behavior
      val capped = Dedup.ngramJaccardPairs(fixtureDocs, "text", "doc_id",
          "lang", 3, 0.5, maxDf = 2)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val lsh = Dedup.minhashLshPairs(fixtureDocs, "text", "doc_id", "lang",
          3, numHashes = 8, bands = 4, threshold = 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val guarded = Dedup.guardedJaccardPairs(fixtureDocs, "text", "doc_id",
          "lang", 3, 0.5, dfBudget = 2)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(guarded == (capped ++ lsh))
    }

    it("the routed LSH tier still finds identical and near-identical docs when every shingle is over budget") {
      // six clones of one text + a near-dup: every shared shingle's df
      // is over budget 2, so the capped tier's universe is empty for
      // the clones — detection must come from the band plane (the sf10
      // regime in miniature, where min df 86 > budget 64)
      val clones = (0L to 5L).map(i =>
        (i, "the quick brown fox jumps over the lazy dog", "en")) :+
        ((6L, "the quick brown fox jumps over the lazy cat", "en")) :+
        ((7L, "completely different words entirely here now and then some", "en"))
      val docs = clones.toDF("doc_id", "text", "lang")
      val pairs = Dedup.guardedJaccardPairs(docs, "text", "doc_id", "lang",
          3, 0.5, dfBudget = 2)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      // all 15 clone pairs (jaccard 1.0, signatures identical in every band)
      val clonePairs = (for { a <- 0L to 5L; b <- (a + 1) to 5L } yield (a, b)).toSet
      assert(clonePairs.subsetOf(pairs))
      // the unrelated doc never pairs
      assert(!pairs.exists(p => p._1 == 7L || p._2 == 7L))
    }

    it("LSH-recovered pairs carry full-universe measures and report once (no double-count with the exact tier)") {
      val docs = Seq(
        (0L, "a b c d e f", "en"),
        (1L, "a b c d e g", "en")
      ).toDF("doc_id", "text", "lang")
      // 4 shingles per doc, 3 shared → jaccard 3/5; with budget 2 the
      // shared shingles (df=2) stay under budget so BOTH tiers find the
      // pair — it must still report exactly once
      val rows = Dedup.guardedJaccardPairs(docs, "text", "doc_id", "lang",
          3, 0.5, dfBudget = 2)
        .as[(Long, Long, Double)].collect()
      assert(rows.toSeq == Seq((0L, 1L, 0.6)))
    }
  }

  describe("guarded similarity stats (q121)") {
    it("equals the uncapped fused pair-similarity report while the budget does not bind (sf0.01)") {
      val old = Dedup.pairSimilarityStats(fixtureDocs, "text", "doc_id",
          "lang", 3, 0.5, 0.6, maxDf = Int.MaxValue)
        .as[(Long, Long, Long, Double, Double, Double)].collect().toSet
      val guarded = Dedup.guardedSimilarityStats(fixtureDocs, "text",
          "doc_id", "lang", 3, 0.5, 0.6)
        .as[(Long, Long, Long, Double, Double, Double)].collect().toSet
      assert(guarded == old)
      assert(guarded.nonEmpty)
    }
  }
}
