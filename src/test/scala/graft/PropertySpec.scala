package graft

import graft.ops.{Num, Relational, Skew}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based specs (SURVEY.md §5.4): invariants that must hold for
  * arbitrary inputs, not just fixtures. Uses plain ScalaCheck generators
  * with fixed seeds (the scalatest-scalacheck bridge artifact is not in
  * the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample battery from a generator. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  private def forAllSamples2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 12).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } body(a, b)
    }
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val rowGen = Gen.listOfN(60,
    for {
      g <- Gen.oneOf("a", "b", "c")
      blk <- Gen.choose(0L, 5L)
      ts <- Gen.choose(0L, 5L)
      amt <- Gen.choose(-100, 100).map(_.toDouble)
    } yield (g, blk, ts, amt))

  describe("latestByKey invariants") {
    it("result ⊆ input, and every surviving row carries its group's max (blk, ts)") {
      forAllSamples(rowGen) { rows =>
        whenever(rows.nonEmpty) {
          val df = rows.toDF("g", "blk", "ts", "amt")
          val out = Relational.latestByKey(df, Seq($"g"), Seq($"blk", $"ts"))
            .as[(String, Long, Long, Double)].collect()
          val maxByG = rows.groupBy(_._1).map { case (g, rs) =>
            g -> rs.map(r => (r._2, r._3)).max
          }
          // every output row has its group's max composite key
          assert(out.forall(r => (r._2, r._3) == maxByG(r._1)))
          // and ALL input rows at that max key survive (tie-keeping)
          val expectedCount = rows.count(r => (r._2, r._3) == maxByG(r._1))
          assert(out.length == expectedCount)
        }
      }
    }
  }

  describe("dsum exactness") {
    it("equals the exact BigDecimal sum regardless of partitioning") {
      forAllSamples2(Gen.listOfN(50, Gen.choose(-1e9, 1e9)), Gen.choose(1, 16)) {
        (xs, parts) =>
          whenever(xs.nonEmpty) {
            val expected = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
              .sum.toDouble
            val got = spark.sparkContext.parallelize(xs, parts).toDF("v")
              .agg(Num.dsum($"v")).as[Double].head()
            assert(got == expected)
          }
      }
    }
  }

  describe("salted aggregation") {
    it("matches the unsalted groupBy for sums and counts") {
      forAllSamples(rowGen) { rows =>
        whenever(rows.nonEmpty) {
          val df = rows.toDF("g", "blk", "ts", "amt")
          val plain = df.groupBy($"g")
            .agg(Num.dsum($"amt").as("s"), count(lit(1)).cast("long").as("n"))
            .as[(String, Double, Long)].collect().toSet
          val salted = Skew.saltedAgg(df, Seq($"g"), 8,
              (sum($"amt".cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("ps"),
               sum($"ps").cast("double").as("s")),
              (count(lit(1)).as("pn"), sum($"pn").cast("long").as("n")))
            .as[(String, Double, Long)].collect().toSet
          assert(salted == plain)
        }
      }
    }
  }

  describe("salted join") {
    it("matches the plain inner join") {
      val factGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 100)))
      forAllSamples(factGen) { facts =>
        whenever(facts.nonEmpty) {
          val fact = facts.toDF("k", "v")
          val dim = Seq((0, "x"), (1, "y"), (2, "z")).toDF("k", "name")
          val plain = fact.join(dim, Seq("k")).select($"k", $"v", $"name")
            .as[(Int, Int, String)].collect().sorted.toSeq
          val salted = Skew.saltedJoin(fact, dim, "k", 4).select($"k", $"v", $"name")
            .as[(Int, Int, String)].collect().sorted.toSeq
          assert(salted == plain)
        }
      }
    }

    it("skewAwareJoin matches the plain join on a forced hot+cold mix") {
      // one genuinely hot key (detected by the probe at full sampling),
      // several cold keys (below threshold), and a fact-only key with no
      // dimension row — the routing must not lose or duplicate any of them
      val hotRows = List.fill(300)((7, 1))
      val coldRows = (0 until 50).map(i => (i % 5, i))
      val orphanRows = List.fill(10)((99, 0)) // no dim match
      val fact = (hotRows ++ coldRows ++ orphanRows).toDF("k", "v")
      val dim = (Seq(7 -> "hot") ++ (0 until 5).map(i => i -> s"c$i")).toDF("k", "name")
      val plain = fact.join(dim, Seq("k")).select($"k", $"v", $"name")
        .as[(Int, Int, String)].collect().sorted.toSeq
      // sampleFraction=1.0 makes detection deterministic: key 7 (300
      // rows) is hot at threshold 100, the cold keys (10 rows each) are not
      val aware = Skew.skewAwareJoin(fact, dim, "k", saltBuckets = 4,
          hotThreshold = 100L, sampleFraction = 1.0)
        .select($"k", $"v", $"name")
        .as[(Int, Int, String)].collect().sorted.toSeq
      assert(aware == plain)
      // LEFT join keeps the orphan fact rows with null dim columns
      val plainLeft = fact.join(dim, Seq("k"), "left")
        .select($"k", $"v", $"name")
        .as[(Int, Int, Option[String])].collect().sorted.toSeq
      val awareLeft = Skew.skewAwareJoin(fact, dim, "k", saltBuckets = 4,
          hotThreshold = 100L, sampleFraction = 1.0, joinType = "left")
        .select($"k", $"v", $"name")
        .as[(Int, Int, Option[String])].collect().sorted.toSeq
      assert(awareLeft == plainLeft)
    }

    it("q54 keeps the NULL-priority group across its exact/approx split (null-safe join)") {
      // the pre-split single aggregate reported a null-key group; the
      // split form joins two aggregates and must do so NULL-SAFELY or
      // that group silently vanishes (the TPC-H fixture has no null
      // priorities, so only this spec observes the contract)
      val dir = java.nio.file.Files.createTempDirectory("q54null").toString
      Seq((Option("1-URGENT"), 100.0), (Option.empty[String], 50.0),
          (Option.empty[String], 70.0))
        .toDF("o_orderpriority", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val out = SparkEntry.queries("q54_approx_quantiles")(spark, dir).collect()
      assert(out.length == 2)
      val nullRow = out.find(_.isNullAt(0)).getOrElse(
        fail("NULL-priority group dropped by the exact/approx join"))
      assert(nullRow.getAs[Double]("exact_p50") == 60.0) // interpolated {50,70}
    }

    it("skewAwareJoin refuses a probe that cannot resolve hot from cold, and internal-column collisions") {
      val fact = Seq((1, 1), (2, 2)).toDF("k", "v")
      val dim = Seq((1, "a"), (2, "b")).toDF("k", "name")
      // hotThreshold x sampleFraction < 1: every sampled key would flag
      // hot and the broadcast-sized hot-set bound silently collapses
      val err = intercept[IllegalArgumentException](
        Skew.skewAwareJoin(fact, dim, "k", saltBuckets = 4,
          hotThreshold = 30L, sampleFraction = 0.02))
      assert(err.getMessage.contains("sampled row per hot key"))
      // a user column named like the internals must be refused, not
      // clobbered then dropped (same contract as prioritySample)
      val clash = fact.withColumn("__salt", $"v")
      val err2 = intercept[IllegalArgumentException](
        Skew.skewAwareJoin(clash, dim, "k", saltBuckets = 4,
          hotThreshold = 100L, sampleFraction = 1.0))
      assert(err2.getMessage.contains("__salt"))
    }

    it("skewAwareJoin with an empty hot set degenerates to the plain join result") {
      val fact = (0 until 60).map(i => (i % 6, i)).toDF("k", "v")
      val dim = (0 until 6).map(i => (i, s"d$i")).toDF("k", "name")
      val plain = fact.join(dim, Seq("k")).select($"k", $"v", $"name")
        .as[(Int, Int, String)].collect().sorted.toSeq
      val aware = Skew.skewAwareJoin(fact, dim, "k", saltBuckets = 8,
          hotThreshold = 1000L, sampleFraction = 1.0)
        .select($"k", $"v", $"name")
        .as[(Int, Int, String)].collect().sorted.toSeq
      assert(aware == plain)
    }
  }

  private val edgeGen: Gen[List[(Long, Long)]] = Gen.listOfN(40,
    for {
      a <- Gen.choose(0L, 19L)
      d <- Gen.choose(1L, 19L) // offset construction: no filter, a ≠ b always
    } yield {
      val b = (a + d) % 20
      (math.min(a, b), math.max(a, b))
    })

  describe("dedupGroups invariants") {
    it("matches a local union-find on arbitrary pair graphs") {
      forAllSamples(edgeGen, n = 8) { edges =>
        whenever(edges.nonEmpty) {
          // local oracle: union-find with path compression
          val parent = scala.collection.mutable.Map.empty[Long, Long]
          def find(x: Long): Long = {
            val p = parent.getOrElseUpdate(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          edges.foreach { case (a, b) =>
            val (ra, rb) = (find(a), find(b))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
          // min-relabel: the component representative is the MIN member,
          // which repeated unions by min-root already guarantee
          val expected = parent.keys.map(n => n -> find(n)).toMap
          val got = graft.ext.Dedup.dedupGroups(
              edges.toDF("id_a", "id_b"), "id_a", "id_b")
            .as[(Long, Long)].collect().toMap
          assert(got == expected)
        }
      }
    }

    it("hopsToRep matches a local BFS from each component's min node") {
      forAllSamples(edgeGen, n = 8) { edges =>
        whenever(edges.nonEmpty) {
          // local oracle: adjacency + BFS seeded at every component min
          val adj = scala.collection.mutable.Map
            .empty[Long, scala.collection.mutable.Set[Long]]
          edges.foreach { case (a, b) =>
            adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
            adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
          }
          val dist = scala.collection.mutable.Map.empty[Long, Long]
          val groupOf = graft.ext.Dedup.dedupGroups(
              edges.toDF("id_a", "id_b"), "id_a", "id_b")
            .as[(Long, Long)].collect().toMap
          groupOf.values.toSet[Long].foreach { rep =>
            val q = scala.collection.mutable.Queue(rep -> 0L)
            while (q.nonEmpty) {
              val (v, d) = q.dequeue()
              if (!dist.contains(v)) {
                dist(v) = d
                adj(v).foreach(u => if (!dist.contains(u)) q.enqueue(u -> (d + 1)))
              }
            }
          }
          val got = graft.ext.Dedup.hopsToRep(
              edges.toDF("id_a", "id_b"), "id_a", "id_b")
            .as[(Long, Long, Long)].collect()
            .map { case (id, rep, h) => id -> (rep, h) }.toMap
          val expected = adj.keys.map(v => v -> (groupOf(v), dist(v))).toMap
          assert(got == expected)
        }
      }
    }
  }

  describe("segmentDedup identity") {
    it("with no corpus-repeated segments, reassembly reproduces the token stream exactly") {
      val docsGen = Gen.listOfN(8, Gen.listOf(
        Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")))
      forAllSamples(docsGen) { docs0 =>
        // tag every token with (doc, position) so ALL tokens are globally
        // unique → no segment can repeat, within a doc or across docs
        // (a small alphabet alone repeats segments inside one doc, which
        // the operator correctly removes — not what this property tests)
        val docs = docs0.zipWithIndex.map { case (toks, i) =>
          toks.zipWithIndex.map { case (t, k) => s"${t}_${i}_$k" }
        }
        val df = docs.zipWithIndex.map { case (toks, i) =>
          (i.toLong, toks.mkString(" "))
        }.toDF("doc_id", "text")
        val out = graft.ext.Dedup.segmentDedup(df, "text", "doc_id",
            segLen = 3, minRep = 2)
          .select($"doc_id", $"n_tokens", $"n_kept_segments", $"clean_text")
          .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
        docs.zipWithIndex.foreach { case (toks, i) =>
          val (_, nTok, nKept, clean) = out(i.toLong)
          assert(nTok == toks.size.toLong)
          assert(nKept == math.ceil(toks.size / 3.0).toLong)
          assert(clean == toks.mkString(" "),
            "clean_text must be the original token stream")
        }
      }
    }
  }

  describe("time-series ops partitioning invariance") {
    // OHLC endpoints and TWAP weights derive from windows/aggregates
    // with total (ts, id) orders — the results must not depend on how
    // the input rows are routed across partitions
    val evGen = Gen.listOfN(40, for {
      key <- Gen.oneOf("x", "y")
      tsOff <- Gen.choose(0L, 172800L) // two days, second granularity
      value <- Gen.choose(-10000, 10000).map(_ / 10.0)
    } yield (key, tsOff, value))

    it("ohlcBars and twap are row-identical under any input partitioning") {
      forAllSamples2(evGen, Gen.choose(1, 16)) { (rows, parts) =>
        whenever(rows.nonEmpty) {
          val withIds = rows.zipWithIndex.map { case ((k, off, v), i) =>
            (i.toLong, new java.sql.Timestamp(1704067200000L + off * 1000L), k, v)
          }
          val base = withIds.toDF("event_id", "ts", "key", "value")
          def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
            df.collect().map(_.toString).sorted.toSeq
          assert(
            canon(graft.ops.TimeSeriesOps.ohlcBars(
              base.coalesce(1), "key", "ts", "event_id", "value")) ==
            canon(graft.ops.TimeSeriesOps.ohlcBars(
              base.repartition(parts), "key", "ts", "event_id", "value")))
          assert(
            canon(graft.ops.TimeSeriesOps.twap(
              base.coalesce(1), "key", "ts", "event_id", "value")) ==
            canon(graft.ops.TimeSeriesOps.twap(
              base.repartition(parts), "key", "ts", "event_id", "value")))
        }
      }
    }
  }

  describe("Skyline.frontier2d vs naive dominance (q173)") {
    // points with deliberate collisions on both axes (small value
    // domains) so duplicate points, x-ties, and y-ties all occur
    val ptsGen = Gen.listOfN(40, for {
      x <- Gen.choose(0, 12).map(_ * 0.5)
      y <- Gen.choose(0, 12).map(_ * 0.5)
    } yield (x, y))

    it("matches the O(n²) dominance filter on arbitrary points, any bucket width") {
      forAllSamples2(ptsGen, Gen.oneOf(0.25, 1.0, 3.0, 100.0)) { (pts, width) =>
        whenever(pts.nonEmpty) {
          val rows = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
          val out = graft.ops.Skyline
            .frontier2d(rows.toDF("id", "x", "y"), "x", "y", width)
            .as[(Long, Double, Double)].collect().toSet
          val naive = rows.filter { case (_, px, py) =>
            !rows.exists { case (_, qx, qy) =>
              qx >= px && qy >= py && (qx > px || qy > py)
            }
          }.toSet
          assert(out == naive, s"width=$width pts=$pts")
        }
      }
    }
  }

  describe("Fifo.matchLots vs a sequential queue (q180)") {
    // per-key event streams; quantities on the cent grid so the
    // reference queue can use exact BigDecimal arithmetic
    val evGen = Gen.listOfN(30, for {
      k <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 9L)
      isIn <- Gen.oneOf(true, false)
      q <- Gen.choose(1, 400).map(_ / 100.0)
    } yield (k, ts, isIn, q))

    /** Reference implementation: literal FIFO queue per key. */
    def queueFifo(evs: List[(Long, Long, Boolean, Double)])
        : Map[(Long, Long, Long), BigDecimal] = {
      val ids = evs.zipWithIndex.map { case ((k, ts, in, q), i) =>
        (k, ts, i.toLong, in, BigDecimal(q).setScale(6))
      }
      ids.groupBy(_._1).flatMap { case (k, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        val lots = scala.collection.mutable.Queue[(Long, BigDecimal)]()
        sorted.collect { case (_, _, id, true, q) => lots.enqueue((id, q)) }
        val matches = scala.collection.mutable.Map[(Long, Long, Long), BigDecimal]()
        sorted.collect { case (_, _, oid, false, q0) =>
          var need = q0
          while (need > 0 && lots.nonEmpty) {
            val (lid, avail) = lots.head
            val take = need.min(avail)
            matches((k, oid, lid)) = take
            if (avail > take) { lots.dequeue(); lots.prepend((lid, avail - take)) }
            else lots.dequeue()
            need -= take
          }
        }
        matches
      }
    }

    it("matches the queue's (purchase, lot) → qty map on arbitrary streams") {
      forAllSamples(evGen) { evs =>
        whenever(evs.nonEmpty) {
          val rows = evs.zipWithIndex.map { case ((k, ts, in, q), i) =>
            (k, ts, i.toLong, in, q)
          }
          val df = rows.toDF("k", "ts", "id", "inflow", "qty")
          val got = graft.ops.Fifo.matchLots(
              df.filter($"inflow"), df.filter(!$"inflow"),
              "k", "ts", "id", "qty")
            .select($"k", $"out_id", $"in_id", $"matched_qty")
            .as[(Long, Long, Long, Double)].collect()
            .map { case (k, o, i2, q) => (k, o, i2) -> BigDecimal(q).setScale(6) }
            .toMap
          assert(got == queueFifo(evs), s"evs=$evs")
        }
      }
    }
  }

  describe("append-sink semantics (K1)") {
    it("unionByName of batch splits equals the whole") {
      forAllSamples(rowGen) { rows =>
        whenever(rows.size > 1) {
          val (l, r) = rows.splitAt(rows.size / 2)
          val whole = rows.toDF("g", "blk", "ts", "amt")
          val unioned = l.toDF("g", "blk", "ts", "amt")
            .unionByName(r.toDF("g", "blk", "ts", "amt"))
          assert(unioned.count() == whole.count())
          val a = unioned.as[(String, Long, Long, Double)].collect().sorted.toSeq
          val b = whole.as[(String, Long, Long, Double)].collect().sorted.toSeq
          assert(a == b)
        }
      }
    }
  }
}
