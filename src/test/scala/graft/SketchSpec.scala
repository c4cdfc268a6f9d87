package graft

import graft.functions.CmsFns._
import graft.queries.SketchOps
import org.apache.spark.sql.functions._

/** Count–Min sketch + the round-6 curation/profiling operators. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val W = 64
  private val D = 4

  private def sketchOf(keys: Seq[String], parts: Int): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(cmsBuild($"k", W, D).as("sk"))
      .select($"sk").as[Array[Byte]].head()

  describe("CmsBuildAgg / CmsEstimate") {
    it("never undercounts: estimate >= true count for every inserted key") {
      val keys = (0 until 300).flatMap(i => Seq.fill(i % 5 + 1)(s"key-${i % 60}"))
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sk = keys.toDF("k").agg(cmsBuild($"k", W, D).as("sk"))
      val est = truth.keys.toSeq.toDF("k").crossJoin(sk)
        .select($"k", cmsEstimate($"sk", $"k", W, D).as("e"))
        .as[(String, Long)].collect().toMap
      truth.foreach { case (k, c) =>
        assert(est(k) >= c, s"undercount for $k: est=${est(k)} true=$c")
      }
    }
    it("sketch matrix is partition-independent (merge = + is order-insensitive)") {
      val keys = (0 until 500).map(i => s"key-${i % 40}")
      assert(java.util.Arrays.equals(sketchOf(keys, 1), sketchOf(keys, 7)))
    }
    it("with no collisions the estimate is exact") {
      // 3 keys into 4x64 buckets: collision probability negligible; if
      // one occurs the assertion message shows which key
      val keys = Seq("alpha", "alpha", "alpha", "beta", "beta", "gamma")
      val sk = keys.toDF("k").agg(cmsBuild($"k", W, D).as("sk"))
      val est = Seq("alpha", "beta", "gamma", "absent").toDF("k").crossJoin(sk)
        .select($"k", cmsEstimate($"sk", $"k", W, D).as("e"))
        .as[(String, Long)].collect().toMap
      assert(est("alpha") == 3 && est("beta") == 2 && est("gamma") == 1)
      assert(est("absent") == 0)
    }
    it("matches a hand-maintained reference matrix, collisions included") {
      // tiny width forces collisions; the aggregate must agree with a
      // direct local simulation using the same (h1 + j*h2) mod w family
      val w = 4
      val keys = (0 until 100).map(i => s"k${i % 17}")
      val ref = new Array[Long](D * w)
      keys.foreach(k => graft.functions.CmsFns.add(
        ref, org.apache.spark.unsafe.types.UTF8String.fromString(k), w, D))
      def refEst(k: String): Long = {
        val bb = java.nio.ByteBuffer.allocate(8 + ref.length * 8)
        bb.putInt(w).putInt(D)
        bb.asLongBuffer().put(ref)
        graft.functions.CmsFns.estimate(bb.array(),
          org.apache.spark.unsafe.types.UTF8String.fromString(k), w, D)
      }
      val sk = keys.toDF("k").repartition(3).agg(cmsBuild($"k", w, D).as("sk"))
      val est = keys.distinct.toDF("k").crossJoin(sk)
        .select($"k", cmsEstimate($"sk", $"k", w, D).as("e"))
        .as[(String, Long)].collect().toMap
      keys.distinct.foreach(k => assert(est(k) == refEst(k), s"mismatch at $k"))
    }
    it("null keys are skipped; empty input estimates zero everywhere") {
      val sk = Seq(Some("x"), None, Some("x")).toDF("k")
        .agg(cmsBuild($"k", W, D).as("sk"))
      val est = Seq("x").toDF("k").crossJoin(sk)
        .select(cmsEstimate($"sk", $"k", W, D)).as[Long].head()
      assert(est == 2)
      val empty = Seq.empty[String].toDF("k").agg(cmsBuild($"k", W, D).as("sk"))
        .select($"sk").as[Array[Byte]].head()
      // counters (past the 8-byte geometry header) are all zero
      assert(empty.drop(8).forall(_ == 0))
    }
    it("rejects a probe whose geometry disagrees with the sketch (no silent wrong counters)") {
      val sk = Seq("x").toDF("k").agg(cmsBuild($"k", W, D).as("sk"))
      def messages(t: Throwable): String =
        if (t == null) "" else t.getMessage + messages(t.getCause)
      val err = intercept[Exception] {
        Seq("x").toDF("k").crossJoin(sk)
          .select(cmsEstimate($"sk", $"k", W * 2, D)).collect()
      }
      assert(messages(err).contains("geometry"), s"got: ${messages(err)}")
      // SAME-PRODUCT mismatch (64x4 built, 32x8 probed) must also fail:
      // a byte-length check alone cannot catch it, the header does
      val err2 = intercept[Exception] {
        Seq("x").toDF("k").crossJoin(sk)
          .select(cmsEstimate($"sk", $"k", W / 2, D * 2)).collect()
      }
      assert(messages(err2).contains("geometry"), s"got: ${messages(err2)}")
    }
    it("rejects out-of-contract width/depth on both build and probe") {
      import graft.functions.{CmsBuildAgg, CmsEstimate}
      val e = org.apache.spark.sql.catalyst.expressions.Literal("x")
      intercept[IllegalArgumentException](CmsBuildAgg(e, 1, 4))
      intercept[IllegalArgumentException](CmsBuildAgg(e, 64, 9))
      intercept[IllegalArgumentException](CmsEstimate(e, e, 1, 4))
      intercept[IllegalArgumentException](CmsEstimate(e, e, 64, 0))
      // matrix bound accounts for the 8-byte serialized header: exactly
      // Int.MaxValue/8 cells would overflow 8 + cells*8 to a negative
      // ByteBuffer size mid-job, so construction must refuse it
      intercept[IllegalArgumentException](CmsBuildAgg(e, Int.MaxValue / 8, 1))
      intercept[IllegalArgumentException](CmsEstimate(e, e, Int.MaxValue / 8, 1))
    }
  }

  describe("gopherRules (q79 operator)") {
    it("attributes each rule's bit and keeps only clean docs") {
      val good = "the quick brown fox jumps over lazy dogs and then walks under " +
        "bright green trees while many birds sing songs about long summer days " +
        "near rivers full of fishes today"
      val docs = Seq(
        (1L, good),                                  // 0: passes all five
        (2L, "the and of " + ("wide " * 30).trim),   // short enough? 33 toks, dup_frac high
        (3L, ""),                                    // empty: short + len band + alpha + stops
        (4L, ("a1 2b 3c 4d " * 10).trim)             // digits: alpha low, no stops
      ).toDF("doc_id", "text")
      val reasons = SketchOps.gopherRules(docs)
        .select($"doc_id", $"reasons").as[(Long, Long)].collect().toMap
      assert(reasons(1L) == 0L)
      // doc 3: n_tokens 0 (bit 1), mean len 0 < 3 (bit 2), alpha 0 (bit 4),
      // no stops (bit 8); dup_frac defined 0 for empty (no bit 16)
      assert(reasons(3L) == (1L | 2L | 4L | 8L))
      // doc 4: alpha 0.5 < 0.75 (bit 4), no stopwords (bit 8),
      // 40 tokens of 4 distinct -> dup_frac 0.9 (bit 16)
      assert((reasons(4L) & 4L) != 0 && (reasons(4L) & 8L) != 0 &&
             (reasons(4L) & 16L) != 0)
      // doc 2: 33 tokens (no bit 1), stops {the, and, of} >= 2 (no bit 8),
      // 30 dup "wide" tokens -> dup_frac > 0.5 (bit 16)
      assert(reasons(2L) == 16L)
      val keeps = SketchOps.gopherRules(docs)
        .select($"doc_id", $"keep").as[(Long, Long)].collect().toMap
      assert(keeps == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    }
  }

  describe("bpeMerge (q89 inner step)") {
    it("implements greedy left-to-right non-overlapping merge semantics") {
      val cases = Seq(
        ("a a a", "a a", "aa", "aa a"),        // adjacent repeat: leftmost wins
        ("x a b a b y", "a b", "ab", "x ab ab y"),
        ("a b a b", "a b", "ab", "ab ab"),     // back-to-back matches both merge
        ("xa b", "a b", "ab", "xa b"),         // no sub-token false positive
        ("a b", "a b", "ab", "ab"),
        ("q", "a b", "ab", "q"))
      val df = cases.map { case (s0, p, m, _) => (s0, p, m) }
        .toDF("sym", "pair", "merged")
      val got = df.select(
        SketchOps.bpeMerge($"sym", $"pair", $"merged").as("out"))
        .as[String].collect().toSeq
      assert(got == cases.map(_._4))
    }
  }

  describe("profile (q82 operator)") {
    it("counts rows, nulls and exact distincts per column in one pass") {
      val df = Seq(
        (Some(1L), Some(1.5), Some("a")),
        (Some(1L), None, Some("b")),
        (Some(2L), Some(2.5), None),
        (None, Some(2.5), Some("a"))
      ).toDF("id", "x", "s")
      val p = SketchOps.profile(df, numCols = Seq("id", "x"), strCols = Seq("s"))
        .collect().map(r => r.getString(0) -> r).toMap
      val id = p("id"); val x = p("x"); val s = p("s")
      assert(id.getLong(1) == 4 && id.getLong(2) == 1 && id.getLong(3) == 2)
      assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 2.0)
      assert(x.getLong(2) == 1 && x.getLong(3) == 2)
      assert(x.getDouble(4) == 1.5 && x.getDouble(5) == 2.5)
      assert(s.getLong(1) == 4 && s.getLong(2) == 1 && s.getLong(3) == 2)
      assert(s.getString(6) == "a" && s.getString(7) == "b")
      // string columns carry no numeric min/max and vice versa
      assert(s.isNullAt(4) && s.isNullAt(5) && id.isNullAt(6) && id.isNullAt(7))
    }
  }

  describe("prioritySample (q81 operator)") {
    it("selection is a pure function of the data: identical across partitionings") {
      val rows = (0 until 200).map(i => (i.toLong, s"g${i % 3}", (i % 50) + 1L))
      def sel(parts: Int) =
        graft.ext.Sampling.prioritySample(
            rows.toDF("doc_id", "grp", "w").repartition(parts),
            "grp", "doc_id", "w", k = 7)
          .select($"grp", $"doc_id", $"rk").as[(String, Long, Long)]
          .collect().toSet
      assert(sel(1) == sel(13))
      assert(sel(1).size == 21) // 3 groups x 7
    }
    it("matches a local recomputation of priority = w / ((h+1)/2^60)") {
      val rows = (0 until 60).map(i => (i.toLong, "g", (i % 9) + 1L))
      val local = rows.map { case (id, _, w) =>
        val h = graft.functions.PortableHashExpr.compute(
          17, org.apache.spark.unsafe.types.UTF8String.fromString(id.toString))
        (id, w.toDouble / ((h + 1L).toDouble / 1152921504606846976.0))
      }.sortBy { case (id, pri) => (-pri, id) }.take(7).map(_._1).toSet
      val got = graft.ext.Sampling.prioritySample(
          rows.toDF("doc_id", "grp", "w"), "grp", "doc_id", "w", k = 7)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == local)
    }
    it("heavier rows win against equal-hash competition more often than light ones") {
      // statistical sanity on the weight sensitivity: weight-100 rows
      // should dominate the top-10 over weight-1 rows
      val rows = (0 until 400).map(i =>
        (i.toLong, "g", if (i < 200) 100L else 1L))
      val picked = graft.ext.Sampling.prioritySample(
          rows.toDF("doc_id", "grp", "w"), "grp", "doc_id", "w", k = 10)
        .select($"doc_id").as[Long].collect()
      assert(picked.count(_ < 200) >= 8, s"heavy rows underselected: ${picked.toSeq}")
    }
  }
}
