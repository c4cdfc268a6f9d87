package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  describe("tokens / tokenCount") {
    it("handles empty, blank, and multi-space text") {
      val df = Seq("", "   ", "one", " a  b   c ").toDF("t")
      val out = df.select(tokenCount($"t")).as[Long].collect().toSeq
      assert(out == Seq(0L, 0L, 1L, 3L))
    }
  }

  describe("wordShingles") {
    it("emits distinct n-grams, empty when fewer than n words") {
      val df = Seq("a b c d", "a b").toDF("t")
      val out = df.select(wordShingles($"t", 3)).as[Seq[String]].collect()
      assert(out(0) == Seq("a b c", "b c d"))
      assert(out(1).isEmpty)
    }
  }

  describe("wordShingleHashes") {
    it("tuple-hash distinctness matches string-shingle distinctness") {
      // repeated trigrams ("a b c" ×2) must collapse exactly like the
      // distinct string shingles do
      val df = Seq("a b c a b c d", "x y", "", "w w w w w").toDF("t")
      val rows = df.select(
          size(wordShingleHashes($"t", 3)).as("nh"),
          size(wordShingles($"t", 3)).as("ns"))
        .as[(Int, Int)].collect()
      rows.foreach { case (nh, ns) => assert(nh == ns) }
    }
    it("distinguishes trigrams that a separator-less concat would conflate") {
      // ("ab","c","d") vs ("a","bc","d"): both concatenate to "abcd" —
      // the tuple hash must keep them apart
      val hs = Seq("ab c d", "a bc d").toDF("t")
        .select(wordShingleHashes($"t", 3).as("h")).as[Seq[Long]].collect()
      assert(hs(0).length == 1 && hs(1).length == 1)
      assert(hs(0).head != hs(1).head)
    }
  }

  describe("qualityScore") {
    it("stays within [0,1] and ranks clean text above noise") {
      val clean = "the quick brown fox jumps over a lazy dog and runs to the hills again"
      val noise = "1234 5678 90!! ??? 00 11 22 33 44 55"
      val df = Seq(clean, noise).toDF("t")
      val Seq(qc, qn) = df.select(qualityScore($"t")).as[Double].collect().toSeq
      assert(qc >= 0 && qc <= 1 && qn >= 0 && qn <= 1)
      assert(qc > qn)
    }
  }

  describe("langId") {
    it("detects marker vocab, deterministic tie-break, und fallback") {
      val df = Seq(
        "der hund ist nicht da",       // de
        "the cat is of the house",     // en
        "el perro y la casa",          // es
        "zzz qqq xxx"                  // no markers
      ).toDF("t")
      val out = df.select(langId($"t")).as[String].collect().toSeq
      assert(out == Seq("de", "en", "es", "und"))
    }
  }

  describe("fingerprint") {
    it("is invariant to case and whitespace runs") {
      val df = Seq(("Hello  World", "hello world"), ("a b", "a c")).toDF("x", "y")
      val eq = df.select((fingerprint($"x") === fingerprint($"y")).as("e"))
        .as[Boolean].collect().toSeq
      assert(eq == Seq(true, false))
    }
  }

  describe("quality classifier (q74)") {
    it("rational sigmoid scores stay strictly inside (0,1), keep matches the threshold, clean beats noise") {
      val rows = SparkEntry.queries("q74_quality_classifier")(spark, "/root/testdata/sf0.001")
        .select($"score", $"keep").as[(Double, Long)].collect()
      assert(rows.nonEmpty)
      // |z/(2(1+|z|))| < 1/2 for all finite z, so the squash can never
      // saturate to 0/1 exactly — a NaN/Inf feature would violate this
      assert(rows.forall { case (s, _) => s > 0.0 && s < 1.0 })
      assert(rows.forall { case (s, k) => k == (if (s >= 0.55) 1L else 0L) })
      val clean = "the quick brown fox and the lazy dog run to the hills of the north again and again"
      val noise = "1234567 8910 11!! 22?? 33 44 55 66 77 88 99 00"
      val sc = Seq((1L, clean), (2L, noise)).toDF("doc_id", "text")
        .select(
          (lit(-2.0) + lit(3.0) * alphaRatio($"text") + lit(4.0) * stopwordRatio($"text")
            - lit(6.0) * digitRatio($"text") + lit(0.1) * avgTokenLen($"text")
            + lit(1.5) * least(tokenCount($"text").cast("double") / lit(50.0), lit(1.0))).as("z"))
        .select((lit(0.5) + $"z" / (lit(2.0) * (lit(1.0) + abs($"z")))).as("s"))
        .as[Double].collect()
      assert(sc(0) > sc(1), s"clean ${sc(0)} must outscore noise ${sc(1)}")
    }
  }

  describe("winnowFingerprints (q101)") {
    /** Straight-line reference: rightmost-min of every w-window over
      * the gram-hash sequence, distinct (h, pos) pairs. */
    def reference(hs: Seq[Long], w: Int): Set[(Long, Long)] =
      if (hs.isEmpty) Set.empty
      else (0 to math.max(hs.length - w, 0)).map { i =>
        val (h, p) = hs.zipWithIndex.slice(i, i + w)
          .minBy { case (h, p) => (h, -p) }
        (h, p.toLong)
      }.toSet

    it("matches the reference selection and returns empty below n tokens") {
      val rnd = new scala.util.Random(7)
      val texts = Seq(
        Seq.fill(60)("t" + rnd.nextInt(500)).mkString(" "),
        Seq.fill(13)("u" + rnd.nextInt(9)).mkString(" "), // forced hash ties
        "a b c d",                                        // below n=5 -> empty
        "")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select($"id",
          transform(wordNgrams($"text", 5), g => portableHash(g, 37)).as("hs"),
          winnowFingerprints($"text", 5, 8, 37).as("fp"))
      df.as[(Long, Seq[Long], Seq[(Long, Long)])].collect().foreach {
        case (_, hs, fp) =>
          assert(fp.toSet == reference(hs, 8))
          assert(fp.length == fp.distinct.length)
      }
    }
    it("two documents sharing a >= w+n-1 token run share a fingerprint hash") {
      val rnd = new scala.util.Random(11)
      def rand(p: String, k: Int) = Seq.fill(k)(p + rnd.nextInt(1000))
      val shared = rand("s", 12) // w + n - 1 = 8 + 5 - 1
      val docA = (rand("a", 30) ++ shared ++ rand("b", 30)).mkString(" ")
      val docB = (rand("c", 25) ++ shared ++ rand("d", 35)).mkString(" ")
      val fps = Seq((1L, docA), (2L, docB)).toDF("id", "text")
        .select($"id", winnowFingerprints($"text", 5, 8, 37).as("fp"))
        .as[(Long, Seq[(Long, Long)])].collect().toMap
      val common = fps(1L).map(_._1).toSet intersect fps(2L).map(_._1).toSet
      assert(common.nonEmpty,
        "a 12-token shared run must yield at least one common fingerprint")
    }
  }

  describe("winnow overlap pairs (q102)") {
    it("bounds hold and the exact near-dup pairs of q21 all surface") {
      val d = "/root/testdata/sf0.001"
      val pairs = SparkEntry.queries("q102_winnow_overlap")(spark, d)
        .as[(Long, Long, Long, Double)].collect()
      pairs.foreach { case (a, b, n, c) =>
        assert(a < b); assert(n >= 1L); assert(c > 0.0 && c <= 1.0)
      }
      // the near-copies the exact-jaccard detector (q21) finds share
      // long unedited runs, so the winnowed detector must find them too
      // (the q101 shared-run guarantee); the reverse need not hold
      val exact = SparkEntry.queries("q21_dedup_ngram_jaccard")(spark, d)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val winnowed = pairs.map(p => (p._1, p._2)).toSet
      assert(exact.subsetOf(winnowed),
        s"missing exact pairs: ${exact -- winnowed}")
    }
  }

  describe("DSIR importance weights (q99)") {
    it("scores every doc, zero-weights empty docs, and ranks the target subset above the rest on average") {
      val d = "/root/testdata/sf0.001"
      val docs = Tables(spark, d, "documents")
      val rows = SparkEntry.queries("q99_dsir_weights")(spark, d)
        .select($"doc_id", $"n_tokens", $"logw")
        .as[(Long, Long, Double)].collect()
      // one score per document, no drops
      assert(rows.length == docs.count())
      // a doc with no tokens has no feature mass -> logw exactly 0
      rows.filter(_._2 == 0L).foreach { case (_, _, w) => assert(w == 0.0) }
      // DSIR's defining property: per TOKEN, documents drawn from the
      // target distribution (quality >= 0.75 here) must average a higher
      // log importance ratio than the rest — E_target[ln(p_t/p_s)] =
      // KL(p_t||p_s) >= 0 while the complement tilts negative. Compared
      // per token, not per doc: the raw logw is a sum over token
      // instances, so doc length would otherwise dominate the signal
      val target = docs
        .select($"doc_id", (qualityScore($"text") >= 0.75).as("t"))
        .as[(Long, Boolean)].collect().toMap
      val (inT, outT) = rows.filter(_._2 > 0).partition(r => target(r._1))
      assert(inT.nonEmpty && outT.nonEmpty)
      val meanIn = inT.map(r => r._3 / r._2).sum / inT.length
      val meanOut = outT.map(r => r._3 / r._2).sum / outT.length
      assert(meanIn > meanOut,
        s"target per-token mean $meanIn must exceed non-target $meanOut")
    }
  }

  describe("BM25 search (q103)") {
    it("ranks are dense from 1, scores positive and non-increasing, hit counts bounded by the query size") {
      val rows = SparkEntry.queries("q103_bm25_search")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Double, Long, Long)].collect()
      assert(rows.nonEmpty)
      // idf = ln((N-df+0.5)/(df+0.5)+1) > 0 always, so every BM25
      // contribution — and therefore every reported score — is positive
      assert(rows.forall(_._3 > 0.0))
      rows.groupBy(_._1).foreach { case (_, rs) =>
        assert(rs.length <= 10)
        val sorted = rs.sortBy(_._5)
        assert(sorted.map(_._5).toSeq == (1L to sorted.length).toSeq)
        sorted.iterator.sliding(2).withPartial(false).foreach { w =>
          assert(w(0)._3 >= w(1)._3, "scores must be non-increasing in rank")
        }
        // each query has 2 terms, so 1 <= n_terms_hit <= 2
        assert(rs.forall(r => r._4 >= 1L && r._4 <= 2L))
      }
    }
  }

  describe("corpus drift (q104)") {
    it("a corpus whose snapshots are token-identical drifts exactly zero; the fixture drifts finitely") {
      val tmp = java.nio.file.Files.createTempDirectory("graft-drift").toString
      // even/odd pairs with identical text -> ca == cb for every term ->
      // surpA == surpB -> every contribution is exactly 0 pre-rounding
      Seq((0L, "alpha beta gamma", "en", "s", 16L),
          (1L, "alpha beta gamma", "en", "s", 16L),
          (2L, "delta beta", "en", "s", 10L),
          (3L, "delta beta", "en", "s", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val self = SparkEntry.queries("q104_corpus_drift")(spark, tmp)
        .as[(String, Long, Long, Long, Double, Double)].collect()
      assert(self.toSeq == Seq(("en", 4L, 5L, 5L, 0.0, 0.0)))
      val fx = SparkEntry.queries("q104_corpus_drift")(spark, "/root/testdata/sf0.001")
        .as[(String, Long, Long, Long, Double, Double)].collect()
      assert(fx.nonEmpty)
      fx.foreach { case (_, v, na, nb, kab, kba) =>
        assert(v > 0 && na > 0 && nb > 0)
        // true smoothed KL >= 0; the 4 dp surprisal rounding can push a
        // near-zero divergence negative by at most ~1e-4 + V*5e-7
        val slack = -(1e-4 + v * 5e-7)
        assert(kab > slack && kba > slack, s"KL below rounding floor: $kab / $kba")
      }
    }
  }
}
