package graft

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, String, String, Double)]) =
    rows.toDF("event_id", "ts_s", "key", "value")
      .select($"event_id", to_timestamp($"ts_s").as("ts"), $"key", $"value")

  describe("resampleInterpolate") {
    it("fills an interior gap by exact linear interpolation") {
      // observed 10:00 avg=10.0 and 13:00 avg=40.0; 11:00 and 12:00 are
      // gaps → interpolated at 20.0 and 30.0 (1/3 and 2/3 of the way)
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:15:00", "a", 10.0),
        (2L, "2024-01-01 13:45:00", "a", 40.0)))
      val out = TimeSeriesOps.resampleInterpolate(ev, "key", "ts", "value")
        .orderBy($"hour")
        .select($"n_obs", $"is_gap", $"v_filled")
        .as[(Long, Boolean, Double)].collect().toSeq
      assert(out == Seq((1L, false, 10.0), (0L, true, 20.0),
                        (0L, true, 30.0), (1L, false, 40.0)))
    }
    it("averages multiple observations in a bucket and spans per-key ranges independently") {
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:00:30", "a", 1.0),
        (2L, "2024-01-01 10:59:59", "a", 3.0),
        (3L, "2024-01-02 00:00:00", "b", 7.0)))
      val out = TimeSeriesOps.resampleInterpolate(ev, "key", "ts", "value")
        .select($"key", $"n_obs", $"v_filled").as[(String, Long, Double)]
        .collect().toSet
      // key a: one bucket with avg (1+3)/2; key b: its own single bucket
      assert(out == Set(("a", 2L, 2.0), ("b", 1L, 7.0)))
    }
  }

  describe("ksDrift (batch edge cases; stream parity in StreamingSpec)") {
    it("rejects a refCdf whose length disagrees with the bucket count") {
      val ev = mkEvents(Seq((1L, "2024-01-01 10:00:00", "a", 5.0)))
      assertThrows[IllegalArgumentException] {
        TimeSeriesOps.ksDrift(ev, "ts", "value", "1 hour", 0.0, 100.0,
          buckets = 10, refCdf = Seq(0.5, 1.0))
      }
    }
    it("rejects a PDF passed as refCdf (not ending at ~1.0) — ADVICE r10") {
      val ev = mkEvents(Seq((1L, "2024-01-01 10:00:00", "a", 5.0)))
      assertThrows[IllegalArgumentException] {
        TimeSeriesOps.w1Drift(ev, "ts", "value", "1 hour", 0.0, 100.0,
          buckets = 4, refCdf = Seq(0.25, 0.25, 0.25, 0.25)) // a PDF
      }
    }
    it("rejects a non-monotone refCdf") {
      val ev = mkEvents(Seq((1L, "2024-01-01 10:00:00", "a", 5.0)))
      assertThrows[IllegalArgumentException] {
        TimeSeriesOps.w1Drift(ev, "ts", "value", "1 hour", 0.0, 100.0,
          buckets = 3, refCdf = Seq(0.6, 0.4, 1.0))
      }
      assertThrows[IllegalArgumentException] {
        TimeSeriesOps.ksDrift(ev, "ts", "value", "1 hour", 0.0, 100.0,
          buckets = 3, refCdf = Seq(0.2, 1.2, 1.0)) // out of [0,1]
      }
    }
    it("clamps out-of-range values into the edge buckets (D reads them there)") {
      // both values clamp to the TOP bucket of [0, 10) with 2 buckets:
      // window CDF = [0, 1]; ref uniform [0.5, 1.0] -> D = 0.5 exactly
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:00:00", "a", 999.0),
        (2L, "2024-01-01 10:30:00", "a", -7.0))) // -7 floors below 0 -> bucket 0
      val out = TimeSeriesOps.ksDrift(ev, "ts", "value", "1 hour", 0.0, 10.0,
          buckets = 2, refCdf = Seq(0.5, 1.0))
        .select($"n", $"d_stat").as[(Long, Double)].collect().toSet
      // one value in each edge bucket: CDF = [0.5, 1.0] == ref -> D = 0
      assert(out == Set((2L, 0.0)))
    }
    it("D is exactly the max CDF gap on a hand case") {
      // 4 values all in bucket 0 of 4 over [0,40): CDF [1,1,1,1] vs
      // uniform ref [0.25,0.5,0.75,1.0] -> D = |1-0.25| = 0.75
      val ev = mkEvents((1 to 4).map(i =>
        (i.toLong, s"2024-01-01 10:0$i:00", "a", 5.0)))
      val out = TimeSeriesOps.ksDrift(ev, "ts", "value", "1 hour", 0.0, 40.0,
          buckets = 4, refCdf = Seq(0.25, 0.5, 0.75, 1.0))
        .select($"d_stat", $"drift").as[(Double, Boolean)].head()
      assert(out == ((0.75, true))) // crit = 1.36/2 = 0.68 < 0.75
    }
  }

  describe("benfordDrift (batch edge cases; stream parity in StreamingSpec)") {
    it("excludes values below 1 and windows with no qualifying rows") {
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:00:00", "a", 0.5),   // excluded
        (2L, "2024-01-01 10:10:00", "a", 0.07),  // excluded
        (3L, "2024-01-01 11:00:00", "a", 23.0))) // hour 11 only
      val out = TimeSeriesOps.benfordDrift(ev, "ts", "value", "1 hour")
        .select($"n").as[Long].collect().toSeq
      assert(out == Seq(1L)) // hour 10 vanishes entirely (n = 0 filter)
    }
    it("reads the first digit through the DECIMAL(18,2) string form") {
      // 9.99 -> digit 9; 10.01 -> digit 1; 100.5 -> digit 1
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:00:00", "a", 9.99),
        (2L, "2024-01-01 10:10:00", "a", 10.01),
        (3L, "2024-01-01 10:20:00", "a", 100.5)))
      // digits {9: 1/3, 1: 2/3}: chi2 fires hugely vs Benford
      val out = TimeSeriesOps.benfordDrift(ev, "ts", "value", "1 hour")
        .select($"n", $"violation").as[(Long, Boolean)].head()
      assert(out == ((3L, true)))
    }
  }

  describe("ohlcBars") {
    it("takes time-ordered endpoints, not value extremes, for open/close") {
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:05:00", "a", 50.0), // first → open
        (2L, "2024-01-01 10:20:00", "a", 99.0), // high
        (3L, "2024-01-01 10:40:00", "a", 1.0),  // low
        (4L, "2024-01-01 10:55:00", "a", 60.0)  // last → close
      ))
      val out = TimeSeriesOps.ohlcBars(ev, "key", "ts", "event_id", "value")
        .select($"open", $"high", $"low", $"close", $"n_ticks", $"volume")
        .as[(Double, Double, Double, Double, Long, Double)].collect().toSeq
      assert(out == Seq((50.0, 99.0, 1.0, 60.0, 4L, 210.0)))
    }
    it("breaks equal-ts ties by the unique id, deterministically") {
      val ev = mkEvents(Seq(
        (2L, "2024-01-01 10:00:00", "a", 20.0),
        (1L, "2024-01-01 10:00:00", "a", 10.0), // lower id wins open
        (3L, "2024-01-01 10:30:00", "a", 30.0)))
      val out = TimeSeriesOps.ohlcBars(ev, "key", "ts", "event_id", "value")
        .select($"open", $"close").as[(Double, Double)].collect().toSeq
      assert(out == Seq((10.0, 30.0)))
    }
  }

  describe("twap") {
    it("weights each tick by its duration until the next tick") {
      // value 10 holds for 3h, value 40 for 1h, last tick weightless:
      // twap = 10*(3/4) + 40*(1/4) = 17.5
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:00:00", "a", 10.0),
        (2L, "2024-01-01 13:00:00", "a", 40.0),
        (3L, "2024-01-01 14:00:00", "a", 999.0)))
      val out = TimeSeriesOps.twap(ev, "key", "ts", "event_id", "value")
        .select($"n_intervals", $"twap").as[(Long, Double)].collect().toSeq
      assert(out == Seq((2L, 17.5)))
    }
    it("drops single-tick days (no weighted interval exists)") {
      val ev = mkEvents(Seq(
        (1L, "2024-01-01 10:00:00", "a", 10.0),
        (2L, "2024-01-02 10:00:00", "a", 10.0)))
      assert(TimeSeriesOps.twap(ev, "key", "ts", "event_id", "value").count() == 0)
    }
  }
}
