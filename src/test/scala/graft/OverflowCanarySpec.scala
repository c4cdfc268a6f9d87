package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** 128-bit-path regression canary (VERDICT r10 #7): the engine's
  * overflow-sensitive aggregates (q163's rank moments, q197's
  * sum-of-squared-cents, q213's joint cent moments) carry magnitudes
  * past int64 only beyond ~1.3M lineitem rows — the driver fixtures
  * stop at 600k, so a regression from DECIMAL(38,0) back to a long sum
  * would stay green on every driver SF and silently wrap at sf1.
  *
  * This spec runs the REAL QueryDefs over a generated 2M-row
  * lineitem / 500k-row orders pair whose values are pure integer
  * functions of the row id, first proving the int64 bound is actually
  * crossed (BigInt check), then asserting the engine's outputs equal a
  * driver-side BigInt + pinned-IEEE re-derivation of the documented
  * formulas — the same independent-derivation contract the DuckDB
  * oracle provides at the driver SFs, kept alive in `sbt test` where
  * no DuckDB exists. */
class OverflowCanarySpec extends SparkSpec {

  private val N = 2000000L // lineitem rows: 4N^3 ~ 3.2e19 > Long.MaxValue
  private val NOrd = 500000L

  // shared integer generators (documented contract with the reference fold)
  private def qtyOf(i: Long): Long = i % 50 + 1
  private def priceOf(i: Long): Long = 900L + (i * 31L) % 104101L
  private def flagOf(i: Long): Int = (i % 3L).toInt
  private def totalOf(k: Long): Long = 1000L + (k * 17L) % 499001L

  private lazy val dir: String = {
    val d = Files.createTempDirectory("overflow_canary").toString
    spark.range(N).select(
      (col("id") % NOrd).as("l_orderkey"),
      (col("id") % 50 + 1).cast("double").as("l_quantity"),
      (lit(900L) + (col("id") * 31) % 104101L).cast("double").as("l_extendedprice"),
      element_at(array(lit("A"), lit("N"), lit("R")),
        (col("id") % 3 + 1).cast("int")).as("l_returnflag"))
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    spark.range(NOrd).select(
      col("id").as("o_orderkey"),
      (lit(1000L) + (col("id") * 17) % 499001L).cast("double").as("o_totalprice"))
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  /** BigInt → double through the same java.math.BigDecimal conversion
    * Spark's Decimal.toDouble uses, so reference and engine round
    * identically. */
  private def d(b: BigInt): Double = new java.math.BigDecimal(b.bigInteger).doubleValue

  private def pin6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  describe("q197_anova_f at 2M rows") {
    it("crosses the int64 bound and matches the BigInt reference") {
      val n = new Array[Long](3)
      val s = Array.fill(3)(BigInt(0))
      val q = Array.fill(3)(BigInt(0))
      var i = 0L
      while (i < N) {
        val c = BigInt(priceOf(i) * 100L)
        val g = flagOf(i)
        n(g) += 1; s(g) += c; q(g) += c * c
        i += 1
      }
      val qt = q.reduce(_ + _)
      assert(qt > BigInt(Long.MaxValue),
        s"fixture too small: sum of squared cents $qt fits int64 — the canary proves nothing")
      val st = s.reduce(_ + _); val nt = n.sum; val k = 3L
      val bt = (0 until 3).map(g =>
        BigInt(math.floor((d(s(g)) * d(s(g)) / n(g).toDouble) / 1e6 + 0.5).toLong))
        .reduce(_ + _)
      val ssb = d(bt - BigInt(math.floor((d(st) * d(st) / nt.toDouble) / 1e6 + 0.5).toLong))
      val ssw = d(BigInt(math.floor(d(qt) / 1e6 + 0.5).toLong) - bt)
      val f = (ssb / (k - 1)) / (ssw / (nt - k))
      val row = SparkEntry.queries("q197_anova_f")(spark, dir).collect().head
      assert(row.getAs[Long]("n") == nt)
      assert(row.getAs[Double]("f_stat") == pin6(f),
        s"f_stat ${row.getAs[Double]("f_stat")} != reference ${pin6(f)}")
    }
  }

  describe("q163_spearman at 2M rows") {
    it("rank moments (~4N^3) match the BigInt reference") {
      // pass 1: min/max of quantity*price (exact small-int doubles)
      var mn = Double.MaxValue; var mx = Double.MinValue
      var i = 0L
      while (i < N) {
        val v = qtyOf(i).toDouble * priceOf(i).toDouble
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      // pass 2: joint (x, y-bin) histogram
      val hist = new java.util.HashMap[(Long, Long), Long]()
      val wBin = (mx - mn) / 256.0
      i = 0L
      while (i < N) {
        val x = qtyOf(i)
        val y = math.min(255L,
          math.floor((qtyOf(i).toDouble * priceOf(i).toDouble - mn) / wBin).toLong)
        hist.merge((x, y), 1L, _ + _)
        i += 1
      }
      import scala.jdk.CollectionConverters._
      val cells = hist.asScala.toSeq.map { case ((x, y), c) => (x, y, c) }
      def rankMap(domain: Seq[(Long, Long)]): Map[Long, Long] = {
        var cum = 0L
        domain.sortBy(_._1).map { case (v, cnt) =>
          val r = 2L * cum + cnt + 1L; cum += cnt; v -> r
        }.toMap
      }
      val rx = rankMap(cells.groupBy(_._1).map { case (x, cs) => (x, cs.map(_._3).sum) }.toSeq)
      val ry = rankMap(cells.groupBy(_._2).map { case (y, cs) => (y, cs.map(_._3).sum) }.toSeq)
      var sx = BigInt(0); var sy = BigInt(0); var sxy = BigInt(0)
      var sxx = BigInt(0); var syy = BigInt(0)
      cells.foreach { case (x, y, c) =>
        val a = BigInt(rx(x)); val b = BigInt(ry(y)); val cc = BigInt(c)
        sx += cc * a; sy += cc * b; sxy += cc * a * b
        sxx += cc * a * a; syy += cc * b * b
      }
      assert(sxx > BigInt(Long.MaxValue),
        s"fixture too small: sum(rx2^2) $sxx fits int64 — the canary proves nothing")
      val nB = BigInt(N)
      val rho = pin6(d(nB * sxy - sx * sy) /
        math.sqrt(d(nB * sxx - sx * sx) * d(nB * syy - sy * sy)))
      val row = SparkEntry.queries("q163_spearman")(spark, dir).collect().head
      assert(row.getAs[Long]("n") == N)
      assert(row.getAs[Double]("rho") == rho,
        s"rho ${row.getAs[Double]("rho")} != reference $rho")
    }
  }

  describe("q213_concordance_ccc at 2M lines / 500k orders") {
    it("joint cent moments (~1e21) match the BigInt reference") {
      val y = new Array[Long](NOrd.toInt)
      var i = 0L
      while (i < N) {
        y((i % NOrd).toInt) += priceOf(i) * 100L
        i += 1
      }
      var sx = BigInt(0); var sy = BigInt(0); var sxx = BigInt(0)
      var syy = BigInt(0); var sxy = BigInt(0)
      var k = 0
      while (k < NOrd) {
        val xv = BigInt(totalOf(k) * 100L); val yv = BigInt(y(k))
        sx += xv; sy += yv; sxx += xv * xv; syy += yv * yv; sxy += xv * yv
        k += 1
      }
      assert(syy > BigInt(Long.MaxValue),
        s"fixture too small: sum y^2 $syy fits int64 — the canary proves nothing")
      val nd = NOrd.toDouble
      val mx = d(sx) / nd; val my = d(sy) / nd
      val vx = d(sxx) / nd - mx * mx
      val vy = d(syy) / nd - my * my
      val cv = d(sxy) / nd - mx * my
      val r = cv / math.sqrt(vx * vy)
      val ccc = 2.0 * cv / (vx + vy + (mx - my) * (mx - my))
      val row = SparkEntry.queries("q213_concordance_ccc")(spark, dir).collect().head
      assert(row.getAs[Long]("n") == NOrd)
      assert(row.getAs[Double]("bias_dollars") ==
        math.floor((mx - my) / 100.0 * 1e4 + 0.5) / 1e4)
      assert(row.getAs[Double]("pearson_r") == pin6(r))
      assert(row.getAs[Double]("ccc") == pin6(ccc))
    }
  }
}
