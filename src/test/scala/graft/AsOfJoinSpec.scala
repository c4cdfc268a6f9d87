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
}
