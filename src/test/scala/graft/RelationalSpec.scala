package graft

import graft.ops.{Num, Relational}
import org.apache.spark.sql.functions._

/** Unit specs for the §2 relational operators (SURVEY.md §5.3):
  * argmax tie-keeping, schema-tolerant select, positional zip,
  * ordered string fold, guarded division. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  describe("RangeJoin.pointInInterval") {
    it("includes start, excludes end, crosses bucket boundaries, emits each match once") {
      val points = Seq(
        (1L, ts("2024-01-01 10:00:00")), // == start → included
        (2L, ts("2024-01-01 11:59:59")), // inside, different bucket than start
        (3L, ts("2024-01-01 12:00:00")), // == end → excluded
        (4L, ts("2024-01-01 09:59:59"))  // before start → excluded
      ).toDF("pid", "ts")
      val ivs = Seq(
        (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))
      ).toDF("iid", "start", "end")
      // 35-minute buckets deliberately misaligned with the interval so
      // it spans 4 buckets — per-point uniqueness must still hold
      val out = graft.ops.RangeJoin.pointInInterval(
          points, "ts", ivs, "start", "end", bucketSeconds = 2100)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSeq.sorted
      assert(out == Seq((1L, 10L), (2L, 10L)))
    }
    it("drops inverted intervals for free instead of exploding their span") {
      val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "ts")
      val ivs = Seq(
        (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")), // valid
        (11L, ts("2024-01-01 11:00:00"), ts("1970-01-01 00:00:00"))  // inverted
      ).toDF("iid", "start", "end")
      val out = graft.ops.RangeJoin.pointInInterval(
          points, "ts", ivs, "start", "end", 60) // 1-min buckets: inverted span would be ~28M rows
        .select($"iid").as[Long].collect().toSeq
      assert(out == Seq(10L))
    }

    it("respects extra equi keys") {
      val points = Seq((1L, "u1", ts("2024-01-01 10:30:00")),
                       (2L, "u2", ts("2024-01-01 10:30:00"))).toDF("pid", "u", "ts")
      val ivs = Seq(("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
        .toDF("u", "start", "end")
      val out = graft.ops.RangeJoin.pointInInterval(
          points, "ts", ivs, "start", "end", 3600, keys = Seq("u"))
        .select($"pid").as[Long].collect().toSeq
      assert(out == Seq(1L))
    }
  }
}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  describe("latestByKey (A1)") {
    it("keeps ALL rows tied on the max composite key") {
      // group g1: two rows share the winning (blk=3, ts=9) pair
      val df = Seq(
        ("g1", 3L, 9L, 10.0), ("g1", 3L, 9L, 20.0), ("g1", 3L, 8L, 99.0),
        ("g1", 2L, 9L, 99.0), ("g2", 1L, 1L, 7.0)
      ).toDF("g", "blk", "ts", "amt")
      val out = Relational.latestByKey(df, Seq($"g"), Seq($"blk", $"ts"))
        .groupBy($"g").agg(sum($"amt").as("s"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(out("g1") == (30.0, 2L)) // both tied rows kept, loser rows dropped
      assert(out("g2") == (7.0, 1L))
    }
  }

  describe("tolerantSelect (P2/P6)") {
    it("keeps+renames present columns, silently drops absent ones") {
      val df = Seq((1, "x")).toDF("a", "b")
      val out = Relational.tolerantSelect(df,
        Seq("a" -> "a2", "missing" -> "m2", "b" -> "b2"))
      assert(out.columns.toSeq == Seq("a2", "b2"))
    }
  }

  describe("zipByPosition (J3/J4)") {
    it("aligns rows by ordinal of the given total orders") {
      val l = Seq((30, "c"), (10, "a"), (20, "b")).toDF("k", "lv")
      val r = Seq((300, "z"), (100, "x"), (200, "y")).toDF("j", "rv")
      val out = Relational.zipByPosition(l, Seq($"k"), r, Seq($"j"))
        .orderBy($"ord").select($"lv", $"rv").as[(String, String)].collect()
      assert(out.toSeq == Seq(("a", "x"), ("b", "y"), ("c", "z")))
    }
  }

  describe("stringFold (A5)") {
    it("produces the reference '(id: x; …)' blob in sorted order") {
      val df = Seq((1, 5, 2.0), (1, 3, 1.0), (1, 4, 9.0)).toDF("g", "bin", "v")
      val out = df.groupBy($"g").agg(
        Relational.stringFold(struct($"bin", $"v"),
          x => format_string("%d: %d", x.getField("bin"),
                             floor(x.getField("v")).cast("long"))).as("s"))
        .select($"s").as[String].head()
      assert(out == "(3: 1; 4: 9; 5: 2)")
    }
  }

  describe("Num.safeDiv (E9)") {
    it("yields null, not Infinity, on zero denominator") {
      val df = Seq((1.0, 0.0), (4.0, 2.0)).toDF("n", "d")
      val out = df.select(Num.safeDiv($"n", $"d").as("r"))
        .as[Option[Double]].collect().toSet
      assert(out == Set(None, Some(2.0)))
    }
  }

  describe("Num.dsum") {
    it("is exact (order-independent) for doubles that break FP associativity") {
      val vals = Seq.fill(1000)(Seq(1e15, 3.14159, -1e15)).flatten
      val df = spark.sparkContext.parallelize(vals, 16).toDF("v")
      val got = df.agg(Num.dsum($"v").as("s")).as[Double].head()
      assert(got == 3141.59) // decimal sum: exactly 1000 * 3.14159
    }
  }
}
