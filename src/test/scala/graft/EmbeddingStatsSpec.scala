package graft

import graft.ext.EmbeddingStats
import org.apache.spark.sql.functions._

class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  describe("EmbeddingStats.covariance") {
    it("matches the hand-computed 2x2 covariance of a tiny sample") {
      // x = (1, 2, 3), y = (2, 4, 6): var(x) = 1, var(y) = 4, cov = 2
      val df = Seq(
        Array(1.0f, 2.0f), Array(2.0f, 4.0f), Array(3.0f, 6.0f)
      ).toDF("embedding")
      val out = EmbeddingStats.covariance(df, "embedding", 2)
        .select($"i", $"j", $"cov").as[(Long, Long, Double)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(out((1L, 1L)) == 1.0)
      assert(out((1L, 2L)) == 2.0)
      assert(out((2L, 2L)) == 4.0)
    }
    it("emits exactly the d(d+1)/2 upper-triangle cells, 1-based") {
      val df = Seq(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
        .toDF("embedding")
      val cells = EmbeddingStats.covariance(df, "embedding", 3)
        .select($"i", $"j").as[(Long, Long)].collect().toSet
      assert(cells == Set((1L,1L),(1L,2L),(1L,3L),(2L,2L),(2L,3L),(3L,3L)))
    }
    it("is partitioning-invariant (exact decimal sums)") {
      val vecs = (1 to 40).map(i =>
        Array.tabulate(4)(k => ((i * 31 + k * 17) % 13 - 6) / 7.0f))
      val one = EmbeddingStats.covariance(
        vecs.toDF("embedding").repartition(1), "embedding", 4)
        .orderBy($"i", $"j").as[(Long, Long, Long, Double)].collect().toSeq
      val many = EmbeddingStats.covariance(
        vecs.toDF("embedding").repartition(7), "embedding", 4)
        .orderBy($"i", $"j").as[(Long, Long, Long, Double)].collect().toSeq
      assert(one == many)
    }
  }

  describe("EmbeddingStats.topComponent") {
    it("finds the dominant axis of a diagonal covariance") {
      // cov = diag(9, 1): top component is e1 with lambda -> 9
      val cov = Seq((1L, 1L, 9.0), (1L, 2L, 0.0), (2L, 2L, 1.0))
        .toDF("i", "j", "cov")
      val out = EmbeddingStats.topComponent(cov, 2, iters = 8)
        .as[(Long, Double, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      val (l, expl, resid) = (out(1L)._3, out(1L)._4, out(1L)._5)
      assert(math.abs(out(1L)._2) > 0.999, "loading concentrates on dim 1")
      assert(math.abs(out(2L)._2) < 0.05)
      assert(math.abs(l - 9.0) < 1e-3)
      assert(math.abs(expl - 0.9) < 1e-3, "explained = 9/(9+1)")
      assert(resid < 1e-3, "self-eval residual reports convergence")
    }
    it("driver-planned and distributed paths are bit-equal (the twin contract)") {
      val vecs = (1 to 30).map(i =>
        Array.tabulate(5)(k => ((i * 13 + k * 29) % 11 - 5) / 5.0f))
      val cov = EmbeddingStats.covariance(vecs.toDF("embedding"), "embedding", 5)
        .localCheckpoint(true)
      val drv = EmbeddingStats.topComponent(cov, 5, iters = 3)
        .orderBy($"i").as[(Long, Double, Double, Double, Double)].collect().toSeq
      val dist = EmbeddingStats.topComponent(cov, 5, iters = 3,
          forceDistributed = true)
        .orderBy($"i").as[(Long, Double, Double, Double, Double)].collect().toSeq
      assert(drv == dist, s"driver:\n$drv\ndistributed:\n$dist")
    }
    it("reports a LARGE residual when 3 iterations cannot converge (honest self-eval)") {
      // eigenvalues 2.0 vs 1.8 (ratio 0.9): after 3 steps the iterate
      // still mixes both eigendirections substantially ((0.9)³ ≈ 0.73)
      // and the residual must say so — hand-computed ≈ 0.049
      val cov = Seq((1L, 1L, 2.0), (1L, 2L, 0.0), (2L, 2L, 1.8))
        .toDF("i", "j", "cov")
      val resid = EmbeddingStats.topComponent(cov, 2, iters = 3)
        .select($"residual_rel").as[Double].head()
      assert(resid > 0.01, s"unconverged spectrum must show residual, got $resid")
      // and more iterations drive it down (contraction ratio 1.8/2.0
      // per step: 27 extra steps ≈ 0.058× the remaining mix)
      val resid30 = EmbeddingStats.topComponent(cov, 2, iters = 30)
        .select($"residual_rel").as[Double].head()
      assert(resid30 < resid / 3,
        s"residual must shrink with iterations: $resid -> $resid30")
    }
  }
}
