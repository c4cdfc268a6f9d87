package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** CDC change record for the WarehouseStream parity tests (top level:
  * local case classes get no Encoder). */
case class WhChg(ts: java.sql.Timestamp, change_type: String,
                 old_g: String, old_v: java.lang.Double,
                 new_g: String, new_v: java.lang.Double)

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  describe("dailyStatsStream") {
    it("incrementally aggregates day windows with a watermark") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      val q = EventStreams.dailyStatsStream(src.toDF())
        .writeStream.format("memory").queryName("daily_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(
          Event(1, ts("2024-01-01 10:00:00"), 1, "click", 2.0),
          Event(2, ts("2024-01-01 11:00:00"), 2, "click", 3.0),
          Event(3, ts("2024-01-02 09:00:00"), 1, "view", 5.0))
        q.processAllAvailable()
        val rows = spark.table("daily_out")
          .select($"day_start".cast("string"), $"event_type", $"n_events", $"value_sum")
          .as[(String, String, Long, Double)].collect().toSet
        assert(rows == Set(
          ("2024-01-01 00:00:00", "click", 2L, 5.0),
          ("2024-01-02 00:00:00", "view", 1L, 5.0)))
      } finally q.stop()
    }
  }

  describe("w1DriftStream") {
    it("matches the batch twin row-for-row and flags an injected level shift") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ref = (1 to 10).map(_ / 10.0)
      val events =
        // hour 1: one value per bucket — matches the reference exactly,
        // W1 = 0: no drift
        (0 until 10).map(i => Event(i + 1, ts(f"2024-01-01 10:0$i%d:00"), 1,
          "trade", i * 10.0 + 5.0)) ++
        // hour 2: all mass in the top bucket — a LEVEL shift: the CDF
        // gap is large in EVERY bucket below the top, so W1 = 10·Σ0.1·9
        // = 9·binWidth = 45 units > 2% of range (2.0): drift
        (0 until 4).map(i => Event(20 + i, ts(f"2024-01-01 11:1$i%d:00"), 2,
          "trade", 95.0))
      val src = MemoryStream[Event]
      val q = EventStreams.w1DriftStream(src.toDF(), "ts", "value", "1 hour",
          lo = 0.0, hi = 100.0, buckets = 10, refCdf = ref)
        .writeStream.format("memory").queryName("w1_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(events: _*)
        q.processAllAvailable()
        val stream = spark.table("w1_out")
          .groupBy($"win_start")
          .agg(org.apache.spark.sql.functions.last($"n").as("n"),
               org.apache.spark.sql.functions.last($"w1").as("w1"),
               org.apache.spark.sql.functions.last($"w1_frac").as("w1_frac"),
               org.apache.spark.sql.functions.last($"drift").as("drift"))
          .select($"win_start".cast("string"), $"n", $"w1", $"w1_frac", $"drift")
          .as[(String, Long, Double, Double, Boolean)].collect().toSet
        val batch = graft.ops.TimeSeriesOps.w1Drift(events.toDF(), "ts", "value",
            "1 hour", lo = 0.0, hi = 100.0, buckets = 10, refCdf = ref)
          .select($"win_start".cast("string"), $"n", $"w1", $"w1_frac", $"drift")
          .as[(String, Long, Double, Double, Boolean)].collect().toSet
        assert(stream == batch)
        assert(stream.collectFirst { case (_, 10L, w1, _, fl) => (w1, fl) }
          .contains((0.0, false)))
        // all 4 rows in bucket 9: gaps 0.1..0.9 over buckets 0..8 →
        // Σ = 4.5, ×binWidth 10 = 45.0
        assert(stream.collectFirst { case (_, 4L, w1, _, fl) => (w1, fl) }
          .contains((45.0, true)))
      } finally q.stop()
    }
  }

  describe("ksDriftStream") {
    it("matches the batch twin row-for-row and flags an injected shape shift") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // reference: uniform over [0, 100) in 10 buckets (CDF 0.1 .. 1.0)
      val ref = (1 to 10).map(_ / 10.0)
      val events =
        // hour 1: one value per bucket — CDF equals the reference
        // exactly, D = 0 < 1.36/sqrt(10): no drift
        (0 until 10).map(i => Event(i + 1, ts(f"2024-01-01 10:0$i%d:00"), 1,
          "trade", i * 10.0 + 5.0)) ++
        // hour 2: all mass in the top bucket — D = 0.9 (the CDF gap at
        // bucket 9's lower edge) > 1.36/sqrt(4) = 0.68: drift
        (0 until 4).map(i => Event(20 + i, ts(f"2024-01-01 11:1$i%d:00"), 2,
          "trade", 95.0))
      val src = MemoryStream[Event]
      val q = EventStreams.ksDriftStream(src.toDF(), "ts", "value", "1 hour",
          lo = 0.0, hi = 100.0, buckets = 10, refCdf = ref)
        .writeStream.format("memory").queryName("ks_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(events: _*)
        q.processAllAvailable()
        val stream = spark.table("ks_out")
          .groupBy($"win_start")
          .agg(org.apache.spark.sql.functions.last($"n").as("n"),
               org.apache.spark.sql.functions.last($"d_stat").as("d_stat"),
               org.apache.spark.sql.functions.last($"d_crit").as("d_crit"),
               org.apache.spark.sql.functions.last($"drift").as("drift"))
          .select($"win_start".cast("string"), $"n", $"d_stat", $"d_crit", $"drift")
          .as[(String, Long, Double, Double, Boolean)].collect().toSet
        val batch = graft.ops.TimeSeriesOps.ksDrift(events.toDF(), "ts", "value",
            "1 hour", lo = 0.0, hi = 100.0, buckets = 10, refCdf = ref)
          .select($"win_start".cast("string"), $"n", $"d_stat", $"d_crit", $"drift")
          .as[(String, Long, Double, Double, Boolean)].collect().toSet
        assert(stream == batch)
        assert(stream.collectFirst { case (_, 10L, d, _, fl) => (d, fl) }
          .contains((0.0, false)))
        assert(stream.collectFirst { case (_, 4L, d, _, fl) => (d, fl) }
          .contains((0.9, true)))
      } finally q.stop()
    }
    it("a late in-watermark row revises the window's verdict in place") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ref = (1 to 10).map(_ / 10.0)
      val src = MemoryStream[Event]
      val q = EventStreams.ksDriftStream(src.toDF(), "ts", "value", "1 hour",
          lo = 0.0, hi = 100.0, buckets = 10, refCdf = ref)
        .writeStream.format("memory").queryName("ks_late_out")
        .outputMode(OutputMode.Update()).start()
      try {
        // two top-bucket values: D = 0.9 just below crit 1.36/sqrt(2) —
        // no wait: 1.36/1.414 = 0.9617 > 0.9 -> no drift yet
        src.addData(
          Event(1, ts("2024-01-01 10:05:00"), 1, "trade", 95.0),
          Event(2, ts("2024-01-01 10:50:00"), 1, "trade", 95.0))
        q.processAllAvailable()
        // late but in-watermark third top-bucket value: n=3, crit
        // 1.36/sqrt(3) = 0.785 < 0.9 -> the SAME window flips to drift
        src.addData(Event(3, ts("2024-01-01 10:20:00"), 2, "trade", 95.0))
        q.processAllAvailable()
        val latest = spark.table("ks_late_out")
          .groupBy($"win_start")
          .agg(org.apache.spark.sql.functions.last($"n").as("n"),
               org.apache.spark.sql.functions.last($"drift").as("drift"))
          .select($"n", $"drift").as[(Long, Boolean)].collect().toSet
        assert(latest == Set((3L, true)))
      } finally q.stop()
    }
  }

  describe("benfordStream") {
    it("matches the batch twin and separates a Benford-ish hour from a uniform one") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // hour 1: digit counts [30,18,12,10,8,7,6,5,4] of 100 — close to
      // Benford (divergence ~1.4e-3 < 0.05: no violation). hour 2: one
      // value per digit — uniform 1/9 frequencies, the d=1 term alone is
      // (1/9 - 0.30103)^2/0.30103 ~ 0.12 > 0.05: violation.
      val benfordCounts = Seq(30, 18, 12, 10, 8, 7, 6, 5, 4)
      val h1 = benfordCounts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(j => (d + 1) * 10.0 + j % 10) }
      val events =
        h1.zipWithIndex.map { case (v, i) =>
          Event(i + 1, ts(f"2024-01-01 10:${i % 60}%02d:00"), 1, "trade", v) } ++
        (1 to 9).map(dg => Event(200 + dg, ts(f"2024-01-01 11:0$dg%d:00"), 2,
          "trade", dg * 10.0))
      val src = MemoryStream[Event]
      val q = EventStreams.benfordStream(src.toDF(), "ts", "value", "1 hour")
        .writeStream.format("memory").queryName("benford_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(events: _*)
        q.processAllAvailable()
        val stream = spark.table("benford_out")
          .groupBy($"win_start")
          .agg(org.apache.spark.sql.functions.last($"n").as("n"),
               org.apache.spark.sql.functions.last($"chi2").as("chi2"),
               org.apache.spark.sql.functions.last($"violation").as("violation"))
          .select($"win_start".cast("string"), $"n", $"chi2", $"violation")
          .as[(String, Long, Double, Boolean)].collect().toSet
        val batch = graft.ops.TimeSeriesOps.benfordDrift(events.toDF(), "ts",
            "value", "1 hour")
          .select($"win_start".cast("string"), $"n", $"chi2", $"violation")
          .as[(String, Long, Double, Boolean)].collect().toSet
        assert(stream == batch)
        assert(stream.collectFirst { case (_, 100L, c, v) => (c < 0.05, v) }
          .contains((true, false)))
        assert(stream.collectFirst { case (_, 9L, c, v) => (c > 0.05, v) }
          .contains((true, true)))
      } finally q.stop()
    }
  }

  describe("hourlyOhlcStream") {
    it("revises bar endpoints when a late-but-in-watermark tick arrives") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      val q = EventStreams.hourlyOhlcStream(src.toDF())
        .writeStream.format("memory").queryName("ohlc_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(
          Event(2, ts("2024-01-01 10:20:00"), 1, "trade", 50.0),
          Event(3, ts("2024-01-01 10:40:00"), 1, "trade", 99.0))
        q.processAllAvailable()
        // a LATE tick earlier in the same hour (inside the 1h watermark)
        // must take over the bar's open
        src.addData(Event(1, ts("2024-01-01 10:05:00"), 1, "trade", 10.0))
        q.processAllAvailable()
        val rows = spark.table("ohlc_out")
          .groupBy($"event_type", $"hour")
          .agg(org.apache.spark.sql.functions.last($"open").as("open"),
               org.apache.spark.sql.functions.last($"high").as("high"),
               org.apache.spark.sql.functions.last($"low").as("low"),
               org.apache.spark.sql.functions.last($"close").as("close"),
               org.apache.spark.sql.functions.last($"n_ticks").as("n"))
          .select($"hour".cast("string"), $"open", $"high", $"low", $"close", $"n")
          .as[(String, Double, Double, Double, Double, Long)].collect().toSet
        assert(rows == Set(("2024-01-01 10:00:00", 10.0, 99.0, 10.0, 99.0, 3L)))
      } finally q.stop()
    }
    it("matches the batch twin on the same rows") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val events = Seq(
        Event(1, ts("2024-01-01 10:05:00"), 1, "trade", 20.0),
        Event(2, ts("2024-01-01 10:50:00"), 1, "trade", 80.0),
        Event(3, ts("2024-01-01 11:10:00"), 1, "trade", 30.0),
        Event(4, ts("2024-01-01 10:15:00"), 2, "quote", 5.0))
      val src = MemoryStream[Event]
      val q = EventStreams.hourlyOhlcStream(src.toDF())
        .writeStream.format("memory").queryName("ohlc_twin_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(events: _*)
        q.processAllAvailable()
        val stream = spark.table("ohlc_twin_out")
          .groupBy($"event_type", $"hour")
          .agg(org.apache.spark.sql.functions.last($"open").as("open"),
               org.apache.spark.sql.functions.last($"close").as("close"),
               org.apache.spark.sql.functions.last($"volume").as("volume"))
          .select($"event_type", $"hour".cast("string"), $"open", $"close", $"volume")
          .as[(String, String, Double, Double, Double)].collect().toSet
        val batch = graft.ops.TimeSeriesOps
          .ohlcBars(events.toDF(), "event_type", "ts", "event_id", "value")
          .select($"event_type", $"hour".cast("string"), $"open", $"close", $"volume")
          .as[(String, String, Double, Double, Double)].collect().toSet
        assert(stream == batch)
      } finally q.stop()
    }
  }

  describe("histogramQuantilesStream") {
    it("matches the batch twin row-for-row and lands the known medians") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      // 4 trades in one hour over [0, 100) with 10 buckets (w = 10):
      // values 5, 15, 15, 95 -> p50: t = 2, first bucket with cum >= 2
      // and c > 0 is bucket 1 (cum = 3), frac = (2-1)/2 -> 15.0
      val events = Seq(
        Event(1, ts("2024-01-01 10:05:00"), 1, "trade", 5.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "trade", 15.0),
        Event(3, ts("2024-01-01 10:20:00"), 2, "trade", 15.0),
        Event(4, ts("2024-01-01 10:40:00"), 2, "trade", 95.0),
        Event(5, ts("2024-01-01 10:30:00"), 1, "quote", 250.0)) // clamps to top bucket
      val src = MemoryStream[Event]
      val q = EventStreams.histogramQuantilesStream(src.toDF(), "event_type",
          "ts", "value", "1 hour", lo = 0.0, hi = 100.0, buckets = 10,
          ps = Seq(0.5, 0.9))
        .writeStream.format("memory").queryName("histq_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(events: _*)
        q.processAllAvailable()
        val stream = spark.table("histq_out")
          .groupBy($"event_type", $"win_start", $"p")
          .agg(org.apache.spark.sql.functions.last($"value_est").as("value_est"),
               org.apache.spark.sql.functions.last($"n").as("n"))
          .select($"event_type", $"win_start".cast("string"), $"p", $"value_est", $"n")
          .as[(String, String, Double, Double, Long)].collect().toSet
        val batch = graft.ops.TimeSeriesOps.histogramQuantiles(events.toDF(),
            "event_type", "ts", "value", "1 hour", lo = 0.0, hi = 100.0,
            buckets = 10, ps = Seq(0.5, 0.9))
          .select($"event_type", $"win_start".cast("string"), $"p", $"value_est", $"n")
          .as[(String, String, Double, Double, Long)].collect().toSet
        assert(stream == batch)
        val trade50 = stream.collectFirst {
          case ("trade", _, 0.5, v, n) => (v, n) }.get
        assert(trade50 == ((15.0, 4L)))
        // the clamped 250 lands in the TOP bucket: quote p50 sits in
        // bucket 9 -> 90 + 10*(0.5*1 - 0)/1 = 95.0
        val quote50 = stream.collectFirst {
          case ("quote", _, 0.5, v, _) => v }.get
        assert(quote50 == 95.0)
      } finally q.stop()
    }
    it("revises a window in place on a late in-watermark row") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      val q = EventStreams.histogramQuantilesStream(src.toDF(), "event_type",
          "ts", "value", "1 hour", lo = 0.0, hi = 100.0, buckets = 10,
          ps = Seq(0.5))
        .writeStream.format("memory").queryName("histq_late_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(
          Event(1, ts("2024-01-01 10:05:00"), 1, "trade", 5.0),
          Event(2, ts("2024-01-01 10:50:00"), 1, "trade", 85.0))
        q.processAllAvailable()
        // late but inside the 1h watermark: same window, revises n 2 -> 3
        src.addData(Event(3, ts("2024-01-01 10:20:00"), 2, "trade", 45.0))
        q.processAllAvailable()
        val latest = spark.table("histq_late_out")
          .groupBy($"event_type", $"win_start", $"p")
          .agg(org.apache.spark.sql.functions.last($"n").as("n"),
               org.apache.spark.sql.functions.last($"value_est").as("value_est"))
          .select($"n", $"value_est").as[(Long, Double)].collect().toSet
        // 3 values 5/45/85: t = 1.5, bucket 4 (cum 2), frac (1.5-1)/1 -> 45.0
        assert(latest == Set((3L, 45.0)))
      } finally q.stop()
    }
  }

  describe("sessionizeStream (flatMapGroupsWithState)") {
    it("emits a closed session when the gap is exceeded") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      val q = EventStreams.sessionizeStream(src.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("sess_out")
        .outputMode(OutputMode.Append()).start()
      try {
        // one user: two events 5 min apart, then a 2 h gap in-batch →
        // first session must close with n=2, value=3.0
        src.addData(
          Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
          Event(2, ts("2024-01-01 10:05:00"), 7, "click", 2.0),
          Event(3, ts("2024-01-01 12:30:00"), 7, "view", 10.0))
        q.processAllAvailable()
        val sessions = spark.table("sess_out").as[SessionOut].collect()
        assert(sessions.length == 1)
        assert(sessions.head == SessionOut(7, ts("2024-01-01 10:00:00"), 2, 3.0))
      } finally q.stop()
    }
  }

  describe("dedupStream (dropDuplicatesWithinWatermark)") {
    it("keeps first-seen documents and drops later identical text") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(Long, Timestamp, String)]
      val q = EventStreams.dedupStream(
          src.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "10 minutes")
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode(OutputMode.Append()).start()
      try {
        src.addData(
          (1L, ts("2024-01-01 10:00:00"), "the quick brown fox"),
          (2L, ts("2024-01-01 10:01:00"), "The  Quick   Brown Fox"), // normalize-dup of 1
          (3L, ts("2024-01-01 10:02:00"), "something else entirely"))
        q.processAllAvailable()
        val kept = spark.table("dedup_out").select($"doc_id").as[Long].collect().toSet
        assert(kept == Set(1L, 3L))
      } finally q.stop()
    }
  }

  describe("conversionJoin (watermarked stream-stream interval join)") {
    it("attributes purchases to views within the horizon, same user only") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val views = MemoryStream[Event]
      val purchases = MemoryStream[Event]
      val q = EventStreams.conversionJoin(views.toDF(), purchases.toDF(), 30)
        .writeStream.format("memory").queryName("conv_out")
        .outputMode(OutputMode.Append()).start()
      try {
        views.addData(
          Event(1, ts("2024-01-01 10:00:00"), 7, "view", 0.0),
          Event(2, ts("2024-01-01 10:00:00"), 8, "view", 0.0))
        purchases.addData(
          Event(90, ts("2024-01-01 10:20:00"), 7, "purchase", 42.0),  // in horizon
          Event(91, ts("2024-01-01 11:20:00"), 7, "purchase", 10.0),  // outside
          Event(92, ts("2024-01-01 10:10:00"), 9, "purchase", 5.0))   // other user
        q.processAllAvailable()
        val rows = spark.table("conv_out")
          .select($"view_id", $"user_id", $"purchase_value")
          .as[(Long, Long, Double)].collect().toSet
        assert(rows == Set((1L, 7L, 42.0)))
      } finally q.stop()
    }
  }

  describe("heavyHitterSketchStream (windowed CMS)") {
    it("folds each window's items into a probe-able fixed-size sketch") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      val q = EventStreams.heavyHitterSketchStream(src.toDF(),
          itemCol = "event_type", tsCol = "ts", watermark = "1 hour",
          windowLen = "1 day", width = 64, depth = 4)
        .writeStream.format("memory").queryName("hh_out")
        .outputMode(OutputMode.Update()).start()
      try {
        src.addData(
          Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
          Event(2, ts("2024-01-01 11:00:00"), 2, "click", 1.0),
          Event(3, ts("2024-01-01 12:00:00"), 3, "view", 1.0),
          Event(4, ts("2024-01-02 10:00:00"), 1, "view", 1.0))
        q.processAllAvailable()
        val sketches = spark.table("hh_out")
          .select($"window_start".cast("string"), $"sketch")
          .as[(String, Array[Byte])].collect().toMap
        def est(day: String, item: String): Long =
          graft.functions.CmsFns.estimate(sketches(day),
            org.apache.spark.unsafe.types.UTF8String.fromString(item), 64, 4)
        assert(est("2024-01-01 00:00:00", "click") == 2)
        assert(est("2024-01-01 00:00:00", "view") == 1)
        assert(est("2024-01-02 00:00:00", "view") == 1)
        assert(est("2024-01-02 00:00:00", "click") == 0)
      } finally q.stop()
    }
  }

  describe("ingestToPartitionedSink (checkpointed file-source ingest)") {
    it("a restarted run processes only files that arrived after the last run") {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("ingest")
      val src = base.resolve("src").toString
      val sink = base.resolve("sink").toString
      val ckpt = base.resolve("ckpt").toString
      def writeBatch(ids: Range, day: String): Unit =
        ids.map(i => (i.toLong, ts(s"$day 10:00:00"), i.toLong % 7,
                      "click", 1.5))
          .toDF("event_id", "ts", "user_id", "event_type", "value")
          .write.mode("append").parquet(src)
      writeBatch(0 until 20, "2024-01-01")
      val q1 = EventStreams.ingestToPartitionedSink(
        EventStreams.eventFileStream(spark, src), sink, ckpt)
      q1.awaitTermination()
      assert(spark.read.parquet(sink).count() == 20)
      // second run, same checkpoint: only the new files flow through —
      // the first 20 rows must NOT be appended again
      writeBatch(100 until 110, "2024-01-02")
      val q2 = EventStreams.ingestToPartitionedSink(
        EventStreams.eventFileStream(spark, src), sink, ckpt)
      q2.awaitTermination()
      val out = spark.read.parquet(sink)
      assert(out.count() == 30)
      assert(out.select($"event_id").distinct().count() == 30)
      // day partitioning came through the sink
      assert(new java.io.File(sink).listFiles()
        .count(_.getName.startsWith("day=")) == 2)
    }
  }

  describe("kmvDistinctStream (windowed distinct sketch)") {
    it("counts window-distinct users exactly below k and revises on late rows") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      val q = EventStreams.kmvDistinctStream(
          src.toDF(), "user_id", "ts", "1 hour", "1 day", k = 64)
        .writeStream.format("memory").queryName("kmv_out")
        .outputMode(OutputMode.Complete()).start()
      try {
        src.addData(
          Event(1, ts("2024-01-01 10:00:00"), 7, "view", 0.0),
          Event(2, ts("2024-01-01 11:00:00"), 7, "view", 0.0), // dup user
          Event(3, ts("2024-01-01 12:00:00"), 8, "view", 0.0),
          Event(4, ts("2024-01-02 09:00:00"), 9, "view", 0.0))
        q.processAllAvailable()
        def ests = spark.table("kmv_out")
          .select($"window_start".cast("string"), $"distinct_est")
          .as[(String, Double)].collect().toMap
        assert(ests == Map("2024-01-01 00:00:00" -> 2.0, "2024-01-02 00:00:00" -> 1.0))
        // late-but-in-watermark new user revises day 1 in place
        src.addData(Event(5, ts("2024-01-01 23:30:00"), 11, "view", 0.0))
        q.processAllAvailable()
        assert(ests("2024-01-01 00:00:00") == 3.0)
      } finally q.stop()
    }
  }

  describe("nearDupSuppressStream (LSH ingest gate)") {
    // arrival order = ts then doc_id; doc texts chosen so 1 and 2 are
    // near-identical (most bands collide, high agreement) and 3 is
    // unrelated (no collisions)
    val docRows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "en",
       "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, ts("2024-01-01 10:01:00"), "en",
       "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (3L, ts("2024-01-01 10:02:00"), "en",
       "completely different subject matter with entirely other words present here"))

    it("matches the batch twin row-for-row on a single micro-batch") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(Long, Timestamp, String, String)]
      val q = EventStreams.nearDupSuppressStream(
          src.toDF().toDF("doc_id", "ts", "lang", "text"),
          "text", "doc_id", "ts", "lang", "10 minutes", horizonMs = 3600000L)
        .writeStream.format("memory").queryName("ndup_out")
        .outputMode(OutputMode.Append()).start()
      try {
        src.addData(docRows: _*)
        q.processAllAvailable()
        val got = spark.table("ndup_out")
          .as[(Long, Int, Long, Double)].collect().toSet
        val want = graft.ext.Dedup.nearDupSuppressBatch(
            docRows.toDF("doc_id", "ts", "lang", "text"),
            "text", "doc_id", "lang", "ts", n = 3, numHashes = 8, bands = 4)
          .as[(Long, Int, Long, Double)].collect().toSet
        assert(got == want)
        assert(got.nonEmpty && got.forall(_._3 == 1L),
          "doc 1 arrived first and must be every bucket's representative")
        assert(got.forall(h => h._1 == 2L && h._4 >= 0.25),
          "only the near-dup doc 2 may be flagged; band collision implies >= 2/8 agreement")
      } finally q.stop()
    }

    it("suppresses across micro-batches: state carries the representative") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[(Long, Timestamp, String, String)]
      val q = EventStreams.nearDupSuppressStream(
          src.toDF().toDF("doc_id", "ts", "lang", "text"),
          "text", "doc_id", "ts", "lang", "10 minutes", horizonMs = 3600000L)
        .writeStream.format("memory").queryName("ndup_out2")
        .outputMode(OutputMode.Append()).start()
      try {
        src.addData(docRows.head)
        q.processAllAvailable()
        assert(spark.table("ndup_out2").count() == 0, "first doc is the rep, no hits")
        src.addData(docRows(1), docRows(2))
        q.processAllAvailable()
        val got = spark.table("ndup_out2")
          .as[(Long, Int, Long, Double)].collect().toSet
        assert(got.nonEmpty && got.forall(h => h._1 == 2L && h._3 == 1L),
          "batch-2 near-dup must hit the batch-1 representative; unrelated doc stays clean")
      } finally q.stop()
    }

    it("hot bucket: one band bucket spanning a large micro-batch matches the batch twin") {
      // the ingest gate's worst case — a spam burst: 600 IDENTICAL texts
      // land in ONE (block, band, band-key) bucket inside a single
      // trigger. The plan-level partition sort (not a per-bucket heap
      // buffer) must order them and the fold must pick the (ts, doc_id)-
      // first row as rep and emit 599 hits per band, exactly like the
      // batch twin.
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val burst = (1 to 600).map { i =>
        (i.toLong, ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"), "en",
         "the quick brown fox jumps over the lazy dog again and again today")
      }
      val src = MemoryStream[(Long, Timestamp, String, String)]
      val q = EventStreams.nearDupSuppressStream(
          src.toDF().toDF("doc_id", "ts", "lang", "text"),
          "text", "doc_id", "ts", "lang", "10 minutes", horizonMs = 3600000L)
        .writeStream.format("memory").queryName("ndup_hot")
        .outputMode(OutputMode.Append()).start()
      try {
        src.addData(burst: _*)
        q.processAllAvailable()
        val got = spark.table("ndup_hot")
          .as[(Long, Int, Long, Double)].collect().toSet
        val want = graft.ext.Dedup.nearDupSuppressBatch(
            burst.toDF("doc_id", "ts", "lang", "text"),
            "text", "doc_id", "lang", "ts", n = 3, numHashes = 8, bands = 4)
          .as[(Long, Int, Long, Double)].collect().toSet
        assert(got == want)
        assert(got.size == 599 * 4, "599 dups x 4 bands")
        assert(got.forall(h => h._3 == 1L && h._4 == 1.0),
          "doc 1 is every bucket's rep; identical text implies full agreement")
      } finally q.stop()
    }
  }

  describe("batch/stream agreement") {
    it("sessionizeBatch matches the streaming sessions on closed sessions") {
      import spark.implicits._
      val events = Seq(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 7, "click", 2.0),
        Event(3, ts("2024-01-01 12:30:00"), 7, "view", 10.0),
        Event(4, ts("2024-01-01 09:00:00"), 8, "view", 4.0)).toDF()
      val batch = EventStreams.sessionizeBatch(events, 30)
        .as[SessionOut].collect().toSet
      assert(batch == Set(
        SessionOut(7, ts("2024-01-01 10:00:00"), 2, 3.0),
        SessionOut(7, ts("2024-01-01 12:30:00"), 1, 10.0),
        SessionOut(8, ts("2024-01-01 09:00:00"), 1, 4.0)))
    }
  }

  describe("scd2Stream (streaming dimension maintenance)") {
    import graft.streaming.EventStreams.Scd2Out

    it("emits closed intervals on type change, extends same-type runs in place, across micro-batches") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      val q = EventStreams.scd2Stream(src.toDS())
        .writeStream.format("memory").queryName("scd2_out")
        .outputMode(OutputMode.Append()).start()
      try {
        src.addData(
          Event(1, ts("2024-01-01 10:00:00"), 7, "view", 0),
          Event(2, ts("2024-01-01 11:00:00"), 7, "view", 0))
        q.processAllAvailable()
        assert(spark.table("scd2_out").count() == 0, "open run stays in state")
        // next batch: same type extends (no emission), then a change
        // closes run 1 exactly at the changing event's timestamp
        src.addData(
          Event(3, ts("2024-01-01 12:00:00"), 7, "view", 0),
          Event(4, ts("2024-01-01 13:00:00"), 7, "purchase", 0))
        q.processAllAvailable()
        val rows = spark.table("scd2_out").as[Scd2Out].collect().toSeq
        assert(rows == Seq(Scd2Out(7, 1, "view",
          micros("2024-01-01 10:00:00"), micros("2024-01-01 13:00:00"), 3)))
      } finally q.stop()
    }

    it("closed rows equal the batch build's closed rows, run ids included (the q134 twin contract)") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val evs = Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "a", 0),
        Event(2, ts("2024-01-01 10:30:00"), 1, "b", 0),
        Event(3, ts("2024-01-01 11:00:00"), 1, "b", 0),
        Event(4, ts("2024-01-01 12:00:00"), 1, "c", 0),
        Event(5, ts("2024-01-01 10:15:00"), 2, "x", 0),
        Event(6, ts("2024-01-01 10:45:00"), 2, "y", 0))
      val src = MemoryStream[Event]
      val q = EventStreams.scd2Stream(src.toDS())
        .writeStream.format("memory").queryName("scd2_twin")
        .outputMode(OutputMode.Append()).start()
      try {
        evs.grouped(2).foreach { g => src.addData(g: _*); q.processAllAvailable() }
        val streamed = spark.table("scd2_twin").as[Scd2Out].collect()
          .map(r => (r.user_id, r.run, r.event_type, r.valid_from_us,
                     r.valid_to_us, r.n_events)).toSet
        val batchClosed = graft.ops.Scd2.build(
            evs.toDF().select($"user_id", $"ts", $"event_id", $"event_type"))
          .filter($"valid_to_us".isNotNull)
          .as[(Long, Long, String, Long, Long, Long)].collect().toSet
        assert(streamed == batchClosed)
      } finally q.stop()
    }
  }

  describe("clampedBalanceStream (streaming saturating wallet)") {
    import graft.streaming.EventStreams.BalanceOut

    it("carries the clamped balance across micro-batches and clamps at both bounds") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val src = MemoryStream[Event]
      // lo=0, hi=10_000_000 micros (10 credits)
      val q = EventStreams.clampedBalanceStream(src.toDS(), 0L, 10000000L)
        .writeStream.format("memory").queryName("wallet_out")
        .outputMode(OutputMode.Append()).start()
      try {
        src.addData(
          Event(1, ts("2024-01-01 10:00:00"), 7, "click", 20.0), // +20 -> cap 10
          Event(2, ts("2024-01-01 11:00:00"), 7, "purchase", 15.0)) // -15 -> floor 0
        q.processAllAvailable()
        src.addData(
          Event(3, ts("2024-01-01 12:00:00"), 7, "view", 3.0)) // 0 + 3 = 3
        q.processAllAvailable()
        val rows = spark.table("wallet_out").as[BalanceOut].collect()
          .sortBy(_.event_id).toSeq
        assert(rows == Seq(
          BalanceOut(7, 1, 10000000L),
          BalanceOut(7, 2, 0L),
          // state carried across the batch boundary: NOT min(hi, 3) of
          // a fresh fold over batch 2 alone under a stale unclamped sum
          BalanceOut(7, 3, 3000000L)))
      } finally q.stop()
    }

    it("equals the batch ScanFold twin row-for-row (the q145 contract)") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val evs = Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 4.5),
        Event(2, ts("2024-01-01 10:30:00"), 1, "purchase", 2.0),
        Event(3, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0),
        Event(4, ts("2024-01-01 12:00:00"), 1, "signup", 1.25),
        Event(5, ts("2024-01-01 10:15:00"), 2, "error", 3.0),
        Event(6, ts("2024-01-01 10:45:00"), 2, "view", 12.0),
        Event(7, ts("2024-01-01 11:45:00"), 2, "purchase", 5.0))
      val src = MemoryStream[Event]
      val q = EventStreams.clampedBalanceStream(src.toDS(), 0L, 8000000L)
        .writeStream.format("memory").queryName("wallet_twin")
        .outputMode(OutputMode.Append()).start()
      try {
        evs.grouped(3).foreach { g => src.addData(g: _*); q.processAllAvailable() }
        val streamed = spark.table("wallet_twin").as[BalanceOut].collect()
          .map(r => (r.user_id, r.event_id, r.balance_micros)).toSet
        val prepped = evs.toDF().select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          (floor(col("value") * lit(1e6)).cast("long") *
            when(col("event_type").isin("signup", "click", "view"), 1L)
              .otherwise(-1L)).as("delta"))
        val batch = graft.ext.ScanFold
          .clampedRunningSum(prepped, "user_id", "ts_us", "event_id", "delta",
            0L, 8000000L)
          .select(col("user_id"), col("event_id"), col("bal"))
          .as[(Long, Long, Long)].collect().toSet
        assert(streamed == batch)
      } finally q.stop()
    }
  }

  describe("warehouseMaintainStream (streaming CDC metric maintenance, VERDICT r10 #8)") {
    it("base rollup ⊕ streamed delta state equals the from-scratch batch rollup at any micro-batch split") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import graft.ops.Num.D
      // the q228 scenario in miniature: old snapshot, corrupted new
      // snapshot, gate upstream of the differ, CDC feed into the stream
      val oldRows = Seq((1L, "HI", 10.0), (2L, "HI", 20.0), (3L, "LO", 30.0),
        (4L, "LO", 40.0), (5L, "HI", 50.0))
      val newRows = Seq((1L, "HI", 11.0), /* 2 deleted */ (3L, "MID", 30.0),
        (4L, "LO", -40.0) /* gated out -> delete */, (5L, "HI", 50.0),
        (6L, "LO", 60.0), (7L, "MID", -1.0) /* gated insert -> no-op */)
      val oldS = oldRows.toDF("k", "g", "v")
      val gated = newRows.toDF("k", "g", "v").filter($"v" > 0)
      val changes = graft.ops.Cdc.snapshotDiff(oldS, gated, Seq("k"), Seq("g", "v"))
        .select(lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")).as("ts"),
          col("change_type"), col("old_g"), col("old_v").as("old_v"),
          col("new_g"), col("new_v").as("new_v"))
        .collect().toSeq
      assert(changes.nonEmpty)

      val feed = changes.map(r => WhChg(r.getTimestamp(0), r.getString(1),
        r.getString(2), if (r.isNullAt(3)) null else r.getDouble(3),
        r.getString(4), if (r.isNullAt(5)) null else r.getDouble(5)))
      val src = MemoryStream[WhChg]
      val q = graft.streaming.WarehouseStream.maintainedAggStream(src.toDF())
        .writeStream.format("memory").queryName("wh_maintain")
        .outputMode(OutputMode.Complete()).start()
      try {
        // shuffled, split across micro-batches: sums must commute
        scala.util.Random.javaRandomToRandom(new java.util.Random(3))
          .shuffle(feed).grouped(2).foreach { g =>
            src.addData(g: _*); q.processAllAvailable()
          }
        val state = spark.table("wh_maintain")
        val maintained = oldS.groupBy($"g")
          .agg(count(lit(1)).cast("long").as("n"), sum($"v".cast(D)).as("sd"))
          .join(state, Seq("g"), "full_outer")
          .select($"g",
            (coalesce($"n", lit(0L)) + coalesce($"dn", lit(0L))).cast("long").as("n"),
            (coalesce($"sd", lit(0).cast(D)) + coalesce($"dv", lit(0).cast(D)))
              .cast("double").as("total"))
          .filter($"n" > 0)
          .as[(String, Long, Double)].collect().toSet
        val scratch = gated.groupBy($"g")
          .agg(count(lit(1)).cast("long").as("n"),
            sum($"v".cast(D)).cast("double").as("total"))
          .as[(String, Long, Double)].collect().toSet
        assert(maintained == scratch,
          s"maintained $maintained != from-scratch $scratch")
      } finally q.stop()
    }

    it("quarantinedStream counts gated-out inserts/updates, never deletes") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val src = MemoryStream[WhChg]
      val q = graft.streaming.WarehouseStream
        .quarantinedStream(src.toDF(), col("new_v") > 0)
        .writeStream.format("memory").queryName("wh_quar")
        .outputMode(OutputMode.Complete()).start()
      try {
        src.addData(
          WhChg(t0, "insert", null, null, "HI", -5.0), // quarantined
          WhChg(t0, "update", "HI", 10.0, "HI", -1.0), // quarantined
          WhChg(t0, "insert", null, null, "LO", 7.0),  // ok
          WhChg(t0, "delete", "LO", -3.0, null, null)) // deletes never count
        q.processAllAvailable()
        assert(spark.table("wh_quar").as[Long].head() == 2L)
      } finally q.stop()
    }
  }

  describe("stateful-fold hot-key shape (VERDICT r10 #2)") {
    import graft.streaming.EventStreams.EwmaOut

    it("one hot key across a 10k-event micro-batch folds correctly with no lambda buffer, and the plan carries exactly one sort") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // ONE user, one big out-of-order micro-batch: the old
      // batch.toSeq.sortBy shape buffered all 10k events on the lambda
      // heap; the partition-sort shape folds the sorted arrival lazily
      // (per-key in-flight memory = the one-Double state row).
      val rnd = new scala.util.Random(7)
      val evs = rnd.shuffle((1 to 10000).toList).map { i =>
        Event(i.toLong, new Timestamp(ts("2024-01-01 00:00:00").getTime
          + i * 1000L), 42L, "view", (i % 97) / 7.0)
      }
      val src = MemoryStream[Event]
      val q = EventStreams.ewmaStream(src.toDS(), alpha = 0.25)
        .writeStream.format("memory").queryName("hotkey_out")
        .outputMode(OutputMode.Append()).start()
      try {
        src.addData(evs: _*) // all 10k in ONE batch
        q.processAllAvailable()
        val streamed = spark.table("hotkey_out").as[EwmaOut].collect()
          .map(r => (r.event_id, r.ewma)).toMap
        val batch = graft.ext.ScanFold.ewma(
            evs.toDF().select(col("user_id"),
              unix_micros(col("ts")).as("ts_us"), col("event_id"),
              col("value")),
            "user_id", "ts_us", "event_id", "value", 0.25)
          .select(col("event_id"), col("ewma"))
          .as[(Long, Double)].collect().toMap
        assert(streamed.size == 10000)
        // bit-for-bit: the stream applied the recurrence in the exact
        // (ts, event_id) order despite the shuffled arrival
        assert(streamed == batch)

        // plan pin: ONE sort — ours, by (user_id, ts, event_id) — and
        // ONE exchange (the explicit repartition; EnsureRequirements
        // added neither a second exchange nor a key-only re-sort that
        // would scramble or re-buffer the arrival)
        val plan = {
          val buf = new java.io.ByteArrayOutputStream()
          Console.withOut(new java.io.PrintStream(buf)) {
            q.explain(extended = false)
          }
          buf.toString("UTF-8")
        }
        val sorts = "(?m)Sort \\[".r.findAllIn(plan).size
        val exchanges = "(?m)Exchange ".r.findAllIn(plan).size
        assert(sorts == 1, s"expected exactly our partition sort, got $sorts:\n$plan")
        assert(exchanges == 1, s"expected exactly the explicit repartition, got $exchanges:\n$plan")
        assert(plan.contains("user_id") && plan.matches("(?s).*Sort \\[user_id[^\\]]*ts[^\\]]*event_id.*"),
          s"sort order must be (user_id, ts, event_id):\n$plan")
      } finally q.stop()
    }
  }

  describe("ewmaStream (streaming smoother)") {
    import graft.streaming.EventStreams.EwmaOut

    it("matches the batch ScanFold.ewma fold BIT-FOR-BIT across micro-batches") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val evs = Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 4.5),
        Event(2, ts("2024-01-01 10:30:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 11:00:00"), 1, "view", 9.37),
        Event(4, ts("2024-01-01 12:00:00"), 1, "view", 1.25),
        Event(5, ts("2024-01-01 10:15:00"), 2, "view", 3.03),
        Event(6, ts("2024-01-01 10:45:00"), 2, "view", 12.0))
      val src = MemoryStream[Event]
      val q = EventStreams.ewmaStream(src.toDS(), alpha = 0.125)
        .writeStream.format("memory").queryName("ewma_twin")
        .outputMode(OutputMode.Append()).start()
      try {
        evs.grouped(2).foreach { g => src.addData(g: _*); q.processAllAvailable() }
        val streamed = spark.table("ewma_twin").as[EwmaOut].collect()
          .map(r => (r.user_id, r.event_id) -> r.ewma).toMap
        val batch = graft.ext.ScanFold.ewma(
            evs.toDF().select(col("user_id"),
              unix_micros(col("ts")).as("ts_us"), col("event_id"),
              col("value")),
            "user_id", "ts_us", "event_id", "value", alpha = 0.125)
          .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
        // exact equality: both sides run the identical left-to-right
        // recurrence on identical doubles
        assert(streamed === batch)
      } finally q.stop()
    }
  }

  describe("holtWintersStream (streaming seasonal smoother)") {
    import graft.streaming.EventStreams.HwOut

    it("matches the batch ScanFold.holtWinters fold BIT-FOR-BIT across micro-batches") {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // 7 observations against m=3: the seasonal slot rotation crosses
      // micro-batch boundaries twice and wraps the cycle twice — the
      // state carry (l, b, t, s[3]) is what is being proven
      val evs = Seq(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 4.5),
        Event(2, ts("2024-01-01 10:30:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 11:00:00"), 1, "view", 9.37),
        Event(4, ts("2024-01-01 12:00:00"), 1, "view", 1.25),
        Event(5, ts("2024-01-01 12:30:00"), 1, "view", 7.75),
        Event(6, ts("2024-01-01 13:00:00"), 1, "view", 3.5),
        Event(7, ts("2024-01-01 13:30:00"), 1, "view", 6.125),
        Event(8, ts("2024-01-01 10:15:00"), 2, "view", 3.03),
        Event(9, ts("2024-01-01 10:45:00"), 2, "view", 12.0))
      val src = MemoryStream[Event]
      val q = EventStreams.holtWintersStream(src.toDS(),
          alpha = 0.25, beta = 0.125, gamma = 0.25, m = 3)
        .writeStream.format("memory").queryName("hw_twin")
        .outputMode(OutputMode.Append()).start()
      try {
        evs.grouped(3).foreach { g => src.addData(g: _*); q.processAllAvailable() }
        val streamed = spark.table("hw_twin").as[HwOut].collect()
          .map(r => (r.user_id, r.event_id) ->
            ((r.level, r.trend, r.seasonal, r.forecast))).toMap
        val batch = graft.ext.ScanFold.holtWinters(
            evs.toDF().select(col("user_id"),
              unix_micros(col("ts")).as("ts_us"), col("event_id"),
              col("value")),
            "user_id", "ts_us", "event_id", "value",
            alpha = 0.25, beta = 0.125, gamma = 0.25, m = 3)
          .collect().map(r => (r.getLong(0), r.getLong(2)) ->
            ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
        assert(streamed === batch)
      } finally q.stop()
    }
  }

  private def micros(s: String): Long = ts(s).getTime * 1000L
}
