package graft

import graft.ext.ScanFold
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ext.ScanFold — the keyed saturating fold (q145's engine).
  *
  * The operator's claim is exact equivalence to the sequential per-key
  * reference fold under ANY input row order and partitioning; the
  * specs check that against an in-memory fold, against the plain
  * window prefix sum when the clamp cannot bind (the two functions
  * coincide exactly iff saturation never fires), and on the edges
  * (empty, single row, bounds with lo > 0, both bounds binding).
  */
class ScanFoldSpec extends SparkSpec {
  import spark.implicits._

  private def reference(rows: Seq[(Long, Long, Long, Long)],
                        lo: Long, hi: Long): Map[(Long, Long, Long), Long] = {
    val start = math.min(hi, math.max(lo, 0L))
    rows.groupBy(_._1).flatMap { case (_, ks) =>
      var bal = start
      ks.sortBy(r => (r._2, r._3)).map { r =>
        bal = math.min(hi, math.max(lo, bal + r._4))
        (r._1, r._2, r._3) -> bal
      }
    }
  }

  private def run(rows: Seq[(Long, Long, Long, Long)],
                  lo: Long, hi: Long): Map[(Long, Long, Long), Long] =
    ScanFold.clampedRunningSum(
        rows.toDF("k", "o1", "o2", "d"), "k", "o1", "o2", "d", lo, hi)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap

  private val rowsGen: Gen[List[(Long, Long, Long, Long)]] =
    Gen.listOfN(80, for {
      k <- Gen.choose(0L, 4L)
      o1 <- Gen.choose(0L, 20L)
      o2 <- Gen.choose(0L, 1000000L) // near-unique tiebreak
      d <- Gen.choose(-50L, 50L)
    } yield (k, o1, o2, d)).map(_.distinctBy(r => (r._1, r._2, r._3)))

  private def forAllSamples[A](gen: Gen[A], n: Int = 15)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  describe("ScanFold.clampedRunningSum") {

    it("equals the sequential reference fold on random keyed streams") {
      forAllSamples(rowsGen) { rows =>
        assert(run(rows, 0L, 30L) === reference(rows, 0L, 30L))
      }
    }

    it("equals the reference when lo > 0 (start clamps up into range)") {
      forAllSamples(rowsGen, n = 6) { rows =>
        assert(run(rows, 10L, 40L) === reference(rows, 10L, 40L))
      }
    }

    it("degenerates to the plain window prefix sum when the clamp cannot bind") {
      forAllSamples(rowsGen, n = 6) { rows =>
        val wide = run(rows, -(1L << 60), 1L << 60)
        val w = Window.partitionBy(col("k")).orderBy(col("o1"), col("o2"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val plain = rows.toDF("k", "o1", "o2", "d")
          .withColumn("bal", sum(col("d")).over(w))
          .select(col("k"), col("o1"), col("o2"), col("bal"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
          .toMap
        assert(wide === plain)
      }
    }

    it("is invariant to input order and partitioning") {
      forAllSamples(rowsGen, n = 4) { rows =>
        val expect = reference(rows, 0L, 30L)
        val shuffled = scala.util.Random.shuffle(rows)
        val repartitioned = ScanFold.clampedRunningSum(
            shuffled.toDF("k", "o1", "o2", "d").repartition(7),
            "k", "o1", "o2", "d", 0L, 30L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
          .toMap
        assert(repartitioned === expect)
      }
    }

    it("handles empty input and a single row") {
      assert(run(Nil, 0L, 10L) === Map.empty)
      assert(run(Seq((1L, 1L, 1L, 25L)), 0L, 10L) ===
        Map((1L, 1L, 1L) -> 10L)) // first delta already saturates the cap
      assert(run(Seq((1L, 1L, 1L, -5L)), 0L, 10L) ===
        Map((1L, 1L, 1L) -> 0L)) // and the floor
    }

    it("saturation is sticky only until deltas pull back inside the range") {
      // +20 capped to 10, -15 floors at 0 (not -5), +3 recovers to 3:
      // exactly the state erasure that makes the fold non-associative
      val rows = Seq((1L, 1L, 1L, 20L), (1L, 2L, 2L, -15L), (1L, 3L, 3L, 3L))
      assert(run(rows, 0L, 10L) ===
        Map((1L, 1L, 1L) -> 10L, (1L, 2L, 2L) -> 0L, (1L, 3L, 3L) -> 3L))
      // the unclamped prefix would be 20, 5, 8 — different everywhere
    }

    it("rejects inverted or overflow-prone bounds") {
      intercept[IllegalArgumentException](run(Nil, 5L, 4L))
      intercept[IllegalArgumentException](run(Nil, 0L, Long.MaxValue))
    }

    it("ewma equals the sequential recurrence bit-for-bit, any order/partitioning") {
      val vGen: Gen[List[(Long, Long, Long, Double)]] =
        Gen.listOfN(60, for {
          k <- Gen.choose(0L, 3L)
          o1 <- Gen.choose(0L, 20L)
          o2 <- Gen.choose(0L, 1000000L)
          x <- Gen.choose(0, 99999).map(_ / 100.0) // 2-dp values like the fixture
        } yield (k, o1, o2, x)).map(_.distinctBy(r => (r._1, r._2, r._3)))
      forAllSamples(vGen, n = 8) { rows =>
        val alpha = 0.125
        val expect: Map[(Long, Long, Long), Double] =
          rows.groupBy(_._1).flatMap { case (_, ks) =>
            var s = 0.0; var first = true
            ks.sortBy(r => (r._2, r._3)).map { r =>
              if (first) { s = r._4; first = false }
              else s = alpha * r._4 + (1.0 - alpha) * s
              (r._1, r._2, r._3) -> s
            }
          }
        val got = ScanFold.ewma(
            scala.util.Random.shuffle(rows).toDF("k", "o1", "o2", "x")
              .repartition(5), "k", "o1", "o2", "x", alpha)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
          .toMap
        // EXACT double equality — the operator's whole point is that the
        // left-to-right fold is bit-stable under repartitioning
        assert(got === expect)
      }
    }

    it("string-key variant matches the long-key fold on the same data") {
      forAllSamples(rowsGen, n = 6) { rows =>
        val expect = reference(rows, 0L, 30L)
        val got = ScanFold.clampedRunningSumS(
            rows.toDF("k", "o1", "o2", "d")
              .withColumn("k", concat(lit("type_"), col("k"))),
            "k", "o1", "o2", "d", 0L, 30L)
          .collect()
          .map(r => (r.getString(0).stripPrefix("type_").toLong,
                     r.getLong(1), r.getLong(2)) -> r.getLong(3))
          .toMap
        assert(got === expect)
      }
    }

    it("holt equals the sequential two-state recurrence bit-for-bit; beta=0 degenerates to ewma") {
      val vGen: Gen[List[(Long, Long, Long, Double)]] =
        Gen.listOfN(50, for {
          k <- Gen.choose(0L, 2L)
          o1 <- Gen.choose(0L, 20L)
          o2 <- Gen.choose(0L, 1000000L)
          x <- Gen.choose(0, 99999).map(_ / 100.0)
        } yield (k, o1, o2, x)).map(_.distinctBy(r => (r._1, r._2, r._3)))
      forAllSamples(vGen, n = 6) { rows =>
        val (alpha, beta) = (0.25, 0.125)
        val expect: Map[(Long, Long, Long), (Double, Double)] =
          rows.groupBy(_._1).flatMap { case (_, ks) =>
            var l = 0.0; var b = 0.0; var first = true
            ks.sortBy(r => (r._2, r._3)).map { r =>
              if (first) { l = r._4; b = 0.0; first = false }
              else {
                val l1 = alpha * r._4 + (1.0 - alpha) * (l + b)
                b = beta * (l1 - l) + (1.0 - beta) * b
                l = l1
              }
              (r._1, r._2, r._3) -> ((l, b))
            }
          }
        val got = ScanFold.holt(rows.toDF("k", "o1", "o2", "x").repartition(4),
            "k", "o1", "o2", "x", alpha, beta)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            ((r.getDouble(3), r.getDouble(4)))).toMap
        assert(got === expect)
        // beta = 0: trend stays 0 and level IS the EWMA recurrence
        val hl = ScanFold.holt(rows.toDF("k", "o1", "o2", "x"),
            "k", "o1", "o2", "x", alpha, 0.0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            ((r.getDouble(3), r.getDouble(4)))).toMap
        val ew = ScanFold.ewma(rows.toDF("k", "o1", "o2", "x"),
            "k", "o1", "o2", "x", alpha)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
          .toMap
        hl.foreach { case (key, (l, b)) =>
          assert(b === 0.0)
          assert(l === ew(key))
        }
      }
    }

    it("holtWinters equals the sequential (2+m)-state recurrence bit-for-bit; gamma=0 degenerates to holt") {
      val vGen: Gen[List[(Long, Long, Long, Double)]] =
        Gen.listOfN(50, for {
          k <- Gen.choose(0L, 2L)
          o1 <- Gen.choose(0L, 20L)
          o2 <- Gen.choose(0L, 1000000L)
          x <- Gen.choose(0, 99999).map(_ / 100.0)
        } yield (k, o1, o2, x)).map(_.distinctBy(r => (r._1, r._2, r._3)))
      forAllSamples(vGen, n = 6) { rows =>
        val (alpha, beta, gamma, m) = (0.25, 0.125, 0.25, 4)
        val expect: Map[(Long, Long, Long), (Double, Double, Double, Double)] =
          rows.groupBy(_._1).flatMap { case (_, ks) =>
            var l = 0.0; var b = 0.0; var t = 0L; var s: Array[Double] = null
            var first = true
            ks.sortBy(r => (r._2, r._3)).map { r =>
              if (first) {
                l = r._4; b = 0.0; t = 0L; s = new Array[Double](m); first = false
              } else {
                t += 1
                val sl = (t % m).toInt
                val sOld = s(sl)
                val l1 = alpha * (r._4 - sOld) + (1.0 - alpha) * (l + b)
                b = beta * (l1 - l) + (1.0 - beta) * b
                s(sl) = gamma * (r._4 - l1) + (1.0 - gamma) * sOld
                l = l1
              }
              (r._1, r._2, r._3) ->
                ((l, b, s((t % m).toInt), l + b + s(((t + 1) % m).toInt)))
            }
          }
        val got = ScanFold.holtWinters(
            rows.toDF("k", "o1", "o2", "x").repartition(4),
            "k", "o1", "o2", "x", alpha, beta, gamma, m)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
        assert(got === expect)
        // gamma = 0 with zero seasonal seeds: the seasonal slots never
        // move, so (level, trend) IS the holt recurrence bit-for-bit
        val hw0 = ScanFold.holtWinters(rows.toDF("k", "o1", "o2", "x"),
            "k", "o1", "o2", "x", alpha, beta, 0.0, m)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
        val hl = ScanFold.holt(rows.toDF("k", "o1", "o2", "x"),
            "k", "o1", "o2", "x", alpha, beta)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            ((r.getDouble(3), r.getDouble(4)))).toMap
        hw0.foreach { case (key, (l, b, sv)) =>
          assert(sv === 0.0)
          assert((l, b) === hl(key))
        }
      }
    }

    it("ewma with alpha = 1 is the identity") {
      val rows = Seq((1L, 1L, 1L, 3.5), (1L, 2L, 2L, 7.25), (2L, 1L, 1L, 0.5))
      val got = ScanFold.ewma(rows.toDF("k", "o1", "o2", "x"),
          "k", "o1", "o2", "x", alpha = 1.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
        .toMap
      assert(got === rows.map(r => (r._1, r._2, r._3) -> r._4).toMap)
    }

    it("plans exactly one exchange and no window") {
      val df = ScanFold.clampedRunningSum(
        spark.range(100).selectExpr("id % 5 as k", "id as o1", "id as o2",
          "id % 7 - 3 as d"), "k", "o1", "o2", "d", 0L, 30L)
      val plan = df.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).length === 1, plan)
      assert(!plan.contains("Window"), plan)
    }
  }
}
