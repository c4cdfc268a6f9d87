package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rows = (1 to 2000).map { i =>
      (s"k${i % 7}", (i * 131) % 997, i.toLong)
    }
    rows.toDF("key", "score", "uid")
  }

  describe("TopKPerKey custom operator") {
    it("matches the window row_number formulation exactly") {
      val viaWindow = df.withColumn("rn",
          row_number().over(Window.partitionBy($"key").orderBy($"score".desc, $"uid")))
        .filter($"rn" <= 5).drop("rn")
        .as[(String, Int, Long)].collect().toSet
      val viaTopK = TopK.perKey(df, Seq($"key"), Seq($"score".desc, $"uid"), 5)
        .as[(String, Int, Long)].collect().toSet
      assert(viaTopK == viaWindow)
    }

    it("handles groups smaller than k and k=1") {
      val tiny = Seq(("a", 1), ("a", 2), ("b", 9)).toDF("key", "v")
      val top1 = TopK.perKey(tiny, Seq($"key"), Seq($"v".desc), 1)
        .as[(String, Int)].collect().toSet
      assert(top1 == Set(("a", 2), ("b", 9)))
      val top9 = TopK.perKey(tiny, Seq($"key"), Seq($"v".desc), 9)
        .as[(String, Int)].collect().toSet
      assert(top9 == Set(("a", 1), ("a", 2), ("b", 9)))
    }

    it("plans as partial → exchange → final (map-side reduction before shuffle)") {
      val plan = TopK.perKey(df, Seq($"key"), Seq($"score".desc, $"uid"), 5)
        .queryExecution.executedPlan.toString
      // SparkPlan.nodeName strips the Exec suffix in plan strings
      val occurrences = "TopKPerKey \\[".r.findAllIn(plan).length
      assert(occurrences == 2, s"expected partial+final TopKPerKeyExec:\n$plan")
      assert(plan.contains("Exchange hashpartitioning(key"), s"missing key exchange:\n$plan")
    }
  }
}
