package graft

import graft.ext.SimilaritySearch
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  describe("VectorFunctions") {
    it("computes dot/norm/cosine with double precision") {
      val df = Seq((Array(1.0f, 0.0f), Array(0.6f, 0.8f))).toDF("a", "b")
      val (d, n, c) = df.select(
        dot($"a", $"b"), l2Norm($"b"), cosine($"a", $"b"))
        .as[(Double, Double, Double)].head()
      assert(math.abs(d - 0.6) < 1e-7)
      assert(math.abs(n - 1.0) < 1e-7)
      assert(math.abs(c - 0.6) < 1e-7)
    }
    it("cosine is null on a zero vector (guarded divide)") {
      val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      assert(df.select(cosine($"a", $"b")).as[Option[Double]].head().isEmpty)
    }
  }

  describe("bruteForceTopK") {
    it("ranks neighbors by cosine, excludes self, respects k") {
      val vecs = Seq(
        (0L, Array(1.0f, 0.0f)),
        (1L, Array(0.9f, 0.1f)),   // closest to 0
        (2L, Array(0.0f, 1.0f)),   // orthogonal to 0
        (3L, Array(-1.0f, 0.0f))   // opposite
      ).toDF("vec_id", "embedding")
      val out = SimilaritySearch.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 2)
        .orderBy($"rk").select($"neighbor_id").as[Long].collect().toSeq
      assert(out == Seq(1L, 2L))
    }
  }

  describe("hyperplane LSH near-dup") {
    it("single-table recall ⊆ multi-table recall ⊆ all true pairs, with exact sims") {
      val vecs = (0L until 30L).map { i =>
        val angle = i.toDouble / 30.0 * 2 * math.Pi
        (i, Array(math.cos(angle).toFloat, math.sin(angle).toFloat))
      }.toDF("vec_id", "embedding")
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      // ground truth: the unblocked all-pairs formulation
      val all = pairSet(SimilaritySearch.nearDupPairs(
        vecs.withColumn("one", lit(1)), "one", 0.95))
      val one = pairSet(SimilaritySearch.nearDupPairsLsh(vecs, 2, 4, 0.95, seed = 3))
      val multi = pairSet(SimilaritySearch.nearDupPairsLshMulti(
        vecs, 2, 4, 0.95, seeds = Seq(3, 17, 31)))
      assert(one.subsetOf(multi), "multi-table recall must dominate")
      assert(multi.subsetOf(all), "LSH must never invent pairs")
      assert(multi.nonEmpty)
    }
  }

  describe("pqTopK") {
    it("scores against reconstructed vectors; exact when every vector is its own codeword") {
      // 4-dim vectors, m=2 subspaces; the codebook contains ALL vectors,
      // so each vector reconstructs to itself and PQ top-k must equal
      // the exact brute-force ranking
      val vecs = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (1L, Array(0.9f, 0.1f, 0.0f, 0.1f)),
        (2L, Array(0.0f, 1.0f, 0.5f, 0.0f)),
        (3L, Array(-1.0f, 0.0f, 0.2f, 0.9f))
      ).toDF("vec_id", "embedding")
      val q = vecs.filter($"vec_id" === 0)
      val pq = SimilaritySearch.pqTopK(vecs, q, dim = 4, m = 2,
        centroidIds = Seq(0L, 1L, 2L, 3L), k = 2)
        .orderBy($"rk").select($"neighbor_id").as[Long].collect().toSeq
      val exact = SimilaritySearch.bruteForceTopK(vecs, q, 2)
        .orderBy($"rk").select($"neighbor_id").as[Long].collect().toSeq
      assert(pq == exact)
    }
    it("quantizes to the nearest codeword (lossy but deterministic)") {
      // codebook = {v0, v3}: v1 must encode to v0's subvectors in every
      // subspace, so its reconstruction IS v0 and sim(query=v0, v1) = 1
      val vecs = Seq(
        (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
        (1L, Array(0.9f, 0.05f, 0.9f, 0.05f)), // near v0 in both subspaces
        (3L, Array(-1.0f, 0.0f, 0.0f, -1.0f))
      ).toDF("vec_id", "embedding")
      val out = SimilaritySearch.pqTopK(vecs, vecs.filter($"vec_id" === 0),
        dim = 4, m = 2, centroidIds = Seq(0L, 3L), k = 2)
      val top = out.filter($"rk" === 1).select($"neighbor_id", $"sim")
        .as[(Long, Double)].head()
      assert(top._1 == 1L)
      assert(math.abs(top._2 - 1.0) < 1e-12, "v1 reconstructs exactly to v0")
    }
  }

  describe("Quantize.int8Report") {
    it("zero vector: scale 0, zero codes, zero error, null cosine") {
      val df = Seq((7L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
      val r = graft.ext.Quantize.int8Report(df)
        .select($"scale", $"code_l1", $"err2", $"cos_rr")
        .as[(Double, Long, Double, Option[Double])].head()
      assert(r == ((0.0, 0L, 0.0, None)))
    }
    it("codes are floor(x/scale + 0.5), bounded to [-127, 127], with the analytic error bound") {
      val df = Seq((1L, Array(1.0f, 0.5f, -1.0f))).toDF("vec_id", "embedding")
      val (scale, l1, err2, cos) = graft.ext.Quantize.int8Report(df)
        .select($"scale", $"code_l1", $"err2", $"cos_rr")
        .as[(Double, Long, Double, Double)].head()
      assert(math.abs(scale - 1.0 / 127) < 1e-15)
      // codes: 1.0→127, 0.5→floor(63.5 + 0.5)=64, -1.0→floor(-126.5)=-127
      assert(l1 == 127L + 64L + 127L)
      // per-element error ≤ scale/2 ⇒ err2 ≤ dim·scale²/4
      assert(err2 >= 0 && err2 <= 3 * scale * scale / 4 + 1e-15)
      assert(cos > 0.9999)
    }
    it("scale keys off max |x| and the extreme element codes to exactly ±127") {
      val df = Seq((1L, Array(-3.0f, 2.0f, 0.5f))).toDF("vec_id", "embedding")
      val (scale, l1) = graft.ext.Quantize.int8Report(df)
        .select($"scale", $"code_l1").as[(Double, Long)].head()
      assert(math.abs(scale - 3.0 / 127) < 1e-15)
      // codes: -3→-127, 2→floor(84.67+0.5)=85, 0.5→floor(21.17+0.5)=21
      assert(l1 == 127L + 85L + 21L)
    }
  }

  describe("knnJoinLsh") {
    it("sims are exact cosines, ranks dense from 1, neighbors co-bucketed with their query") {
      val vecs = (0L until 40L).map { i =>
        val angle = i.toDouble / 40.0 * 2 * math.Pi
        (i, Array(math.cos(angle).toFloat, math.sin(angle).toFloat))
      }.toDF("vec_id", "embedding")
      val out = SimilaritySearch.knnJoinLsh(
        vecs, vecs.filter($"vec_id" % 10 === 0), dim = 2, nPlanes = 3,
        seed = 5, k = 3)
        .select($"query_id", $"neighbor_id", $"sim", $"rk")
        .as[(Long, Long, Double, Long)].collect()
      assert(out.nonEmpty)
      // dense ranks from 1 per query, bounded by k
      out.groupBy(_._1).foreach { case (_, rows) =>
        assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
        assert(rows.length <= 3)
      }
      // sims match an independent cosine computation; pairs co-bucket
      val emb = vecs.as[(Long, Array[Float])].collect().toMap
      val planes = SimilaritySearch.hyperplanes(dim = 2, nPlanes = 3, seed = 5)
      def bucket(v: Array[Float]): Long =
        planes.zipWithIndex.map { case (p, j) =>
          val d = p.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
          if (d >= 0) 1L << j else 0L
        }.sum
      out.foreach { case (q, n, sim, _) =>
        assert(q != n)
        assert(bucket(emb(q)) == bucket(emb(n)), s"pair ($q,$n) not co-bucketed")
        val (a, b) = (emb(q).map(_.toDouble), emb(n).map(_.toDouble))
        val exact = a.zip(b).map { case (x, y) => x * y }.sum /
          (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
        assert(math.abs(sim - exact) < 1e-12)
      }
    }
  }

  describe("ivfTopK") {
    it("returns only cell-probed neighbors, k-bounded, self excluded") {
      val vecs = (0L until 40L).map { i =>
        val angle = i.toDouble / 40.0 * math.Pi
        (i, Array(math.cos(angle).toFloat, math.sin(angle).toFloat))
      }.toDF("vec_id", "embedding")
      val out = SimilaritySearch.ivfTopK(
        vecs, vecs.filter($"vec_id" === 0), centroidIds = Seq(0L, 13L, 26L, 39L),
        nProbe = 2, k = 3)
      val rows = out.select($"neighbor_id", $"rk").as[(Long, Long)].collect()
      assert(rows.length == 3)
      assert(!rows.map(_._1).contains(0L))
      // nearest true neighbor (vec 1) lives in the probed cell of centroid 0
      assert(rows.minBy(_._2)._1 == 1L)
    }
  }

  describe("semDedupSummary (q73 composition)") {
    it("collapses cosine-identical vectors to one representative per group, keeps the rest") {
      // vecs 0/1/2 identical up to positive scale (cosine 1 — one group,
      // rep 0 kept, 1 and 2 dropped); 3/4 near-orthogonal to them and to
      // each other below the threshold — always kept regardless of
      // bucketing (a bucket collision still fails the cosine verify)
      val vecs = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
        (1L, Array(2.0f, 0.0f, 0.0f, 0.0f), 0),
        (2L, Array(0.5f, 0.0f, 0.0f, 0.0f), 1),
        (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
        (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1)
      ).toDF("vec_id", "embedding", "label")
      val out = SimilaritySearch
        .semDedupSummary(vecs, "label", dim = 4, nPlanes = 4,
                         threshold = 0.9, seed = 11)
        .select($"label", $"n_vecs", $"n_kept", $"n_dropped")
        .as[(Int, Long, Long, Long)].collect().toMap2
      // label 0: vecs {0,1,3} — 1 dropped (dup of 0); label 1: {2,4} — 2 dropped
      assert(out(0) == ((3L, 2L, 1L)))
      assert(out(1) == ((2L, 1L, 1L)))
    }
  }

  describe("kmeansCodebook") {
    it("partitions the corpus: member counts sum to the corpus size and centroids separate the clusters") {
      import org.apache.spark.sql.functions.col
      // two tight clusters around orthogonal axes + their seed points
      val vecs = (
        (0 until 20).map(i => (i.toLong, Array(1.0f, 0.01f * i, 0f, 0f))) ++
        (20 until 40).map(i => (i.toLong, Array(0f, 0.01f * (i - 20), 1.0f, 0f)))
      ).toDF("vec_id", "embedding")
      val out = SimilaritySearch.kmeansCodebook(vecs, initIds = Seq(0L, 20L), iters = 3)
      val counts = out.select($"cell", $"n_members").distinct()
        .as[(Long, Long)].collect().toMap
      assert(counts.values.sum == 40)
      assert(counts == Map(0L -> 20L, 1L -> 20L))
      // cluster-0 centroid points along dim 0, cluster-1 along dim 2
      val c = out.select($"cell", $"dim", $"val").as[(Long, Long, Double)]
        .collect().map { case (cl, d, v) => (cl, d) -> v }.toMap
      assert(c((0L, 0L)) > 0.9 && c((0L, 2L)) == 0.0)
      assert(c((1L, 2L)) > 0.9 && c((1L, 0L)) == 0.0)
    }
    it("is partitioning-independent (decimal means, deterministic assignment)") {
      val vecs = (0 until 60).map(i =>
        (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 13 - 6).toFloat)))
        .toDF("vec_id", "embedding")
      def run(parts: Int) = SimilaritySearch
        .kmeansCodebook(vecs.repartition(parts), initIds = Seq(0L, 1L, 2L), iters = 2)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(run(1) == run(11))
    }
  }

  describe("IVF recall self-eval (q100)") {
    it("counts are consistent and recall is exactly the hit fraction of the brute-force truth") {
      val (nT, nI, nH, rec) = SparkEntry
        .queries("q100_ivf_recall")(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Double)].collect().head
      // 10 queries x k=5 on both sides; the intersection is bounded by either
      assert(nT == 50L && nI == 50L)
      assert(nH >= 0L && nH <= nT)
      assert(rec == nH.toDouble / nT)
      // the eval must be capable of reporting imperfection: on the
      // structure-free synthetic embeddings, 4-of-16-cell probing
      // cannot recover every true neighbor (if this ever reads 1.0 the
      // composition is comparing a pipeline against itself)
      assert(rec < 1.0)
    }
  }

  describe("jlProject (q106)") {
    it("is deterministic, dimension-correct, and exact on identical/scaled vectors") {
      val vecs = Seq(
        (0L, Array.tabulate(8)(i => (i + 1).toFloat)),
        (1L, Array.tabulate(8)(i => (i + 1).toFloat)),        // identical to 0
        (2L, Array.tabulate(8)(i => 2f * (i + 1).toFloat)),   // 2× scale of 0
        (3L, Array.tabulate(8)(i => if (i == 0) 1f else 0f))
      ).toDF("vec_id", "embedding")
      val out = SimilaritySearch.jlProject(vecs, dim = 8, outDim = 4, seed = 23)
        .as[(Long, Array[Double])].collect().toMap
      assert(out.values.forall(_.length == 4))
      // projection is a pure function of the vector: identical in, identical out
      assert(out(0L).toSeq == out(1L).toSeq)
      // linearity: scaling the input scales every projection exactly
      assert(out(2L).toSeq == out(0L).map(_ * 2.0).toSeq)
      // rerun = same result (compile-time plane matrix, no RNG state)
      val again = SimilaritySearch.jlProject(vecs, dim = 8, outDim = 4, seed = 23)
        .as[(Long, Array[Double])].collect().toMap
      assert(again(3L).toSeq == out(3L).toSeq)
      // and identical vectors keep cosine ~1 after projection (not
      // bit-exact 1: sqrt(S)*sqrt(S) need not equal S), so the q106
      // distortion eval scores such pairs at error ~0
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      assert(math.abs(cos(out(0L), out(1L)) - 1.0) < 1e-12)
    }
  }

  describe("prototypePrune (q105)") {
    it("prunes exactly the most-prototypical quartile of every cluster, rank-monotone in cosine") {
      // the kmeansCodebook fixture: two tight clusters + their seeds
      val vecs = (
        (0 until 20).map(i => (i.toLong, Array(1.0f, 0.01f * i, 0f, 0f))) ++
        (20 until 40).map(i => (i.toLong, Array(0f, 0.01f * (i - 20), 1.0f, 0f)))
      ).toDF("vec_id", "embedding")
      val out = SimilaritySearch.prototypePrune(vecs, initIds = Seq(0L, 20L), iters = 2)
        .as[(Long, Long, Double, Long, Long)].collect()
      assert(out.length == 40)
      assert(out.map(_._1).distinct.length == 40, "every vector scored exactly once")
      out.groupBy(_._2).foreach { case (_, rows) =>
        val n = rows.length
        // integer-arithmetic quartile: exactly n/4 pruned, and they are
        // precisely the best-ranked (most prototypical) rows
        assert(rows.count(_._5 == 1L) == n / 4)
        assert(rows.filter(_._5 == 1L).map(_._4).sorted.toSeq ==
          (1L to (n / 4).toLong).toSeq)
        // prototypicality is non-increasing in rank
        val byRank = rows.sortBy(_._4)
        assert(byRank.map(_._4).toSeq == (1L to n.toLong).toSeq)
        byRank.iterator.sliding(2).withPartial(false).foreach { w =>
          assert(w(0)._3 >= w(1)._3)
        }
      }
    }
  }

  private implicit class Tup4Ops(rows: Array[(Int, Long, Long, Long)]) {
    def toMap2: Map[Int, (Long, Long, Long)] =
      rows.map { case (l, a, b, c) => l -> ((a, b, c)) }.toMap
  }
}
