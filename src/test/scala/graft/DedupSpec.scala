package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy cat", "en"), // near-dup of 0
    (2L, "completely different words entirely here now and then some", "en"),
    (3L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 0
    (4L, "the quick brown fox jumps over the lazy dog", "fr")  // dup, other block
  ).toDF("doc_id", "text", "lang")

  describe("exact dedup") {
    it("groups identical normalized text under one keeper") {
      val out = Dedup.exact(docs, "text", "doc_id")
        .select($"keep_id", $"n_dupes").as[(Long, Long)].collect().toSet
      // docs 0,3,4 identical (block-free exact dedup) → keeper 0 with 3 copies
      assert(out == Set((0L, 3L), (1L, 1L), (2L, 1L)))
    }
  }

  describe("ngram jaccard near-dup") {
    it("finds the planted near-dup pair within its lang block only") {
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 1L))) // near-dup
      assert(pairs.contains((0L, 3L))) // exact dup, jaccard 1.0
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // fr block isolated
      assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated text
    }
  }

  describe("minhash LSH") {
    it("recovers the same verified pairs as exact jaccard") {
      val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", "lang", 3, 8, 4, 0.5)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(lsh == exact)
    }
  }

  describe("simhash") {
    it("separates near-dups (small hamming) from unrelated docs") {
      val fp = Dedup.simhash(docs, "text", "doc_id")
        .as[(Long, Long)].collect().toMap
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
      assert(ham(0L, 3L) == 0)   // identical text → identical fingerprint
      assert(ham(0L, 1L) <= 12)  // near-dup → close
      assert(ham(0L, 2L) > 12)   // unrelated → far
    }
    it("simhashPairs respects the block column and distance bound") {
      val pairs = Dedup.simhashPairs(docs, "text", "doc_id", "lang", 12)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 3L)))
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    }
  }
}
