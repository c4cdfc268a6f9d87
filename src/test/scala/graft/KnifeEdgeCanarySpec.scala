package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Locks the round-11 sf1 cross-engine conversion knife edges in
  * `sbt test` the way OverflowCanarySpec locks the 128-bit paths
  * (VERDICT r11 ask #7) — so neither a future oracle edit nor a Spark
  * upgrade can silently reintroduce them. Two divergence classes,
  * each exercised AT its boundary:
  *
  * 1. DECIMAL→DOUBLE past 2^53 unscaled (q03/q143/q171/q228 money
  *    sums): DuckDB's direct cast double-rounds (int128→double, then
  *    ÷10^scale) while Spark single-rounds via BigDecimal.doubleValue
  *    — a 1-ulp divergence. Fix: route the oracle's final cast
  *    through VARCHAR (correctly rounded in both engines).
  *
  * 2. DOUBLE→DECIMAL(38,6) within ~5e-7 of a 6-dp grid boundary
  *    (q215 moments, month 23951 = 172.2575385): DuckDB decides on
  *    fl(x·1e6), Spark on the exact binary expansion. Fix: the
  *    floor-grid `floor(x*1e6+0.5)/1e6` BEFORE any decimal cast —
  *    the decision then happens on the identical double in both
  *    engines.
  *
  * The spec (a) proves each hazard is REAL at the documented
  * magnitude (an explicit boundary value where the two engines'
  * conversion rules disagree), (b) pins Spark's side of the contract
  * the fixes rely on, and (c) text-pins the fix patterns in the
  * shipped oracle SQL of every affected query.
  */
class KnifeEdgeCanarySpec extends SparkSpec {
  import spark.implicits._

  /** DuckDB's direct DECIMAL(38,6)→DOUBLE: unscaled int→double first
    * (one rounding), then an IEEE division by 10^6 (second rounding). */
  private def doubleRounded(unscaled: BigInt): Double =
    unscaled.toDouble / 1e6

  /** Spark's DECIMAL→DOUBLE (and both engines' VARCHAR route): one
    * correctly-rounded conversion of the exact rational. */
  private def singleRounded(unscaled: BigInt): Double =
    new java.math.BigDecimal(unscaled.bigInteger, 6).doubleValue()

  describe("class 1: DECIMAL -> DOUBLE past 2^53 unscaled") {
    // search the q03 money-sum magnitude (sf1 sum_base ~ 2.3e13 dollars
    // -> unscaled ~ 2.3e19 > 2^53) for a divergent value; the class is
    // dense enough that a tiny scan finds one — proving the hazard is
    // real exactly where the oracles operate
    val base = BigInt("23000000000000000001")
    val divergent = (0 until 2000).map(base + _)
      .find(u => doubleRounded(u) != singleRounded(u))

    it("the two engines' conversion rules really disagree at the q03 magnitude") {
      assert(divergent.nonEmpty,
        "no divergent value in 2000 candidates — the double-rounding " +
          "hazard this canary guards has vanished; re-examine the VARCHAR routes")
      val u = divergent.get
      assert(math.abs(doubleRounded(u) - singleRounded(u)) > 0,
        s"u=$u")
    }

    it("Spark's decimal->double cast is the single-rounded conversion") {
      // cancel (not NoSuchElementException) if the hazard scan came up
      // empty — only the first canary carries the curated diagnostic
      assume(divergent.nonEmpty)
      val u = divergent.get
      val bd = new java.math.BigDecimal(u.bigInteger, 6)
      val got = Seq(bd.toPlainString).toDF("s")
        .select($"s".cast(DecimalType(38, 6)).cast("double")).as[Double].head()
      assert(got == singleRounded(u),
        "Spark no longer single-rounds DECIMAL->DOUBLE — every money-sum " +
          "oracle's VARCHAR route must be re-audited")
    }

    it("the VARCHAR route is correctly rounded (the fix's other half)") {
      assume(divergent.nonEmpty)
      val u = divergent.get
      val bd = new java.math.BigDecimal(u.bigInteger, 6)
      // DuckDB's CAST(VARCHAR AS DOUBLE) is strtod = correctly rounded;
      // the JVM's parseDouble is the same contract
      assert(java.lang.Double.parseDouble(bd.toPlainString) == singleRounded(u))
    }

    it("every money-sum oracle routes its final cast through VARCHAR") {
      val routed = Seq("q03_group_agg", "q143_incremental_agg",
                       "q171_warehouse_pipeline", "q228_gated_cdc_maintain")
      val sqls = SparkEntry.oracleSql
      routed.foreach { q =>
        assert(sqls.contains(q), s"$q left the registry — update this canary")
        assert(sqls(q).contains("AS VARCHAR) AS DOUBLE"),
          s"$q's oracle lost the DECIMAL->VARCHAR->DOUBLE route; at sf1 " +
            "its money sums double-round in DuckDB and diverge by 1 ulp")
      }
    }
  }

  describe("class 2: DOUBLE -> DECIMAL(38,6) at a grid boundary") {
    // boundary doubles at the q215 monthly-maxima magnitude (the sf1
    // divergence was month 23951 ~ 172.2575385 in millions): d is the
    // double nearest a 6-dp grid MIDPOINT (k+0.5)/1e6 — the knife edge
    // where the two rules can disagree
    val boundary = (172257000 until 172258000).map(k => (k, (k + 0.5) / 1e6))
      .find { case (k, d) =>
        val duck = math.floor(d * 1e6 + 0.5).toLong // decides on fl(d*1e6)
        val sp = new java.math.BigDecimal(d) // decides on the exact expansion
          .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
        duck != sp
      }

    it("the two engines' decimal-rounding decisions really disagree at the boundary") {
      // DuckDB rounds on fl(x*1e6) — which lands on or above the .5 —
      // while Spark rounds the exact binary expansion of x (typically
      // just under the midpoint); HALF_UP then disagrees by a grid step
      assert(boundary.nonEmpty,
        "no divergent midpoint double in 1000 candidates — the " +
          "double->decimal hazard this canary guards has vanished; " +
          "re-check the recorded q215 rationale before relaxing oracles")
    }

    it("the floor-grid decides on the identical double in Spark columns and plain scala") {
      assume(boundary.nonEmpty)
      val d = boundary.get._2
      val plain = math.floor(d * 1e6 + 0.5) / 1e6
      val viaColumn = Seq(d).toDF("x")
        .select(floor($"x" * lit(1e6) + lit(0.5)) / lit(1e6)).as[Double].head()
      assert(viaColumn == plain)
      // and the decimal cast of the GRIDDED value is no longer at a
      // knife edge: Spark's exact-expansion decision on `plain` agrees
      // with the grid point the floor chose
      val asDec = Seq(plain).toDF("x")
        .select($"x".cast(DecimalType(38, 6)).cast("string")).as[String].head()
      assert(asDec == new java.math.BigDecimal(plain)
        .setScale(6, java.math.RoundingMode.HALF_UP).toPlainString)
    }

    it("q215's oracle keeps the floor-grid before every decimal cast") {
      val sql = SparkEntry.oracleSql("q215_gumbel_maxima")
      assert(sql.contains("CAST(floor(m6 * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6))"))
      assert(sql.contains("CAST(floor(m6 * m6 * 1e6 + 0.5) / 1e6 AS DECIMAL(38,6))"))
      assert(!sql.contains("CAST(m6 AS DECIMAL"),
        "a raw double->decimal cast re-entered q215's oracle — the sf1 " +
          "month-23951 knife edge will reopen")
    }
  }
}
