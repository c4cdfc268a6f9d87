package graft

import graft.ops.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  describe("AsOfJoin.lastBefore") {
    it("matches strictly-earlier rights; equal timestamps do NOT match") {
      val left = Seq(
        (1L, 7L, ts("2024-01-01 10:00:00")),
        (2L, 7L, ts("2024-01-01 12:00:00")),
        (3L, 8L, ts("2024-01-01 09:00:00"))
      ).toDF("id", "k", "ts")
      val right = Seq(
        (7L, ts("2024-01-01 10:00:00")), // equal to left id=1 → must NOT match it
        (7L, ts("2024-01-01 11:00:00"))
      ).toDF("k", "ts")
      val out = AsOfJoin.lastBefore(left, right, "k", "ts")
        .select($"id", $"asof_right_ts").as[(Long, Option[Timestamp])]
        .collect().toMap
      assert(out(1L).isEmpty)                              // only an equal-ts right exists
      assert(out(2L).contains(ts("2024-01-01 11:00:00")))  // latest earlier right
      assert(out(3L).isEmpty)                              // no rights for key 8
    }
  }

  describe("AsOfJoin.firstAfter") {
    it("matches strictly-later rights; equal timestamps do NOT match") {
      val left = Seq(
        (1L, 7L, ts("2024-01-01 10:00:00")),
        (2L, 7L, ts("2024-01-01 12:00:00")),
        (3L, 8L, ts("2024-01-01 09:00:00"))
      ).toDF("id", "k", "ts")
      val right = Seq(
        (7L, ts("2024-01-01 12:00:00")), // equal to left id=2 → must NOT match it
        (7L, ts("2024-01-01 11:00:00"))
      ).toDF("k", "ts")
      val out = AsOfJoin.firstAfter(left, right, "k", "ts")
        .select($"id", $"asof_right_ts").as[(Long, Option[Timestamp])]
        .collect().toMap
      assert(out(1L).contains(ts("2024-01-01 11:00:00")))  // earliest later right
      assert(out(2L).isEmpty)                              // only an equal-ts right exists
      assert(out(3L).isEmpty)
    }
  }

  describe("AsOfJoin.nearestWithin") {
    it("picks the closer side, breaks ties backward, and nulls beyond the tolerance") {
      val left = Seq(
        (1L, 7L, ts("2024-01-01 10:00:00")), // prev 1h away, next 30min → next
        (2L, 7L, ts("2024-01-01 11:00:00")), // prev 30min, next 30min (tie) → prev
        (3L, 7L, ts("2024-01-01 20:00:00"))  // nearest is 8.5h away → null at 1h tol
      ).toDF("id", "k", "ts")
      val right = Seq(
        (7L, ts("2024-01-01 09:00:00")),
        (7L, ts("2024-01-01 10:30:00")),
        (7L, ts("2024-01-01 11:30:00"))
      ).toDF("k", "ts")
      val out = AsOfJoin.nearestWithin(left, right, "k", "ts", 3600000000L)
        .select($"id", $"asof_right_ts").as[(Long, Option[Timestamp])]
        .collect().toMap
      assert(out(1L).contains(ts("2024-01-01 10:30:00")))
      assert(out(2L).contains(ts("2024-01-01 10:30:00")))  // tie → backward
      assert(out(3L).isEmpty)
    }
  }
}
