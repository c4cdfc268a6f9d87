package graft

import graft.sinks.ReportSink

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  describe("bucketed storage (co-located joins)") {
    it("same-bucketed tables join and aggregate with ZERO shuffle exchanges") {
      val facts = (1L to 200L).map(i => (i % 40, i, i * 1.5))
        .toDF("key", "id", "amount")
      val dims = (0L to 39L).map(k => (k, s"name_$k"))
        .toDF("key", "name")
      ReportSink.writeBucketed(facts, "bkt_facts", buckets = 8,
        bucketCols = Seq("key"), sortCols = Seq("key"))
      ReportSink.writeBucketed(dims, "bkt_dims", buckets = 8,
        bucketCols = Seq("key"))
      try {
        val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "key")
          .groupBy($"key", $"name").agg(org.apache.spark.sql.functions.sum($"amount").as("total"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join/agg must be exchange-free:\n$plan")
        // and it is still correct
        assert(joined.count() == 40)
        val total = joined.agg(org.apache.spark.sql.functions.sum($"total"))
          .first().getDouble(0)
        assert(math.abs(total - (1L to 200L).map(_ * 1.5).sum) < 1e-6)
      } finally {
        spark.sql("DROP TABLE IF EXISTS bkt_facts")
        spark.sql("DROP TABLE IF EXISTS bkt_dims")
      }
    }
  }
}
