package graft

import graft.functions.TextFunctions.portableHash
import org.apache.spark.sql.functions._

class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  describe("PortableHashExpr") {
    it("equals the defining md5/conv column formula for arbitrary inputs") {
      val inputs = Seq("", "a", "hello world", "日本語", "x" * 500,
                       "the quick brown fox", "123:456", "a\nb\tc")
      val df = inputs.toDF("t")
      Seq(0, 7, 13, 42).foreach { seed =>
        val formula = conv(substring(md5(concat(lit(seed.toString), lit(":"), $"t")), 1, 15), 16, 10)
          .cast("long")
        val pairs = df.select(portableHash($"t", seed).as("fast"), formula.as("ref"))
          .as[(Long, Long)].collect()
        pairs.foreach { case (fast, ref) => assert(fast == ref) }
      }
    }
    it("Md5Halves60 equals the defining substring(md5) formulas (both halves)") {
      import graft.functions.TextFunctions.md5Halves60
      val inputs = Seq("", "a", "hello world", "日本語", "x" * 500, "a b c")
      val rows = inputs.toDF("t").select(
          md5Halves60($"t").getItem(0).as("h1"),
          md5Halves60($"t").getItem(1).as("h2"),
          conv(substring(md5($"t"), 1, 15), 16, 10).cast("long").as("r1"),
          conv(substring(md5($"t"), 17, 15), 16, 10).cast("long").as("r2"))
        .as[(Long, Long, Long, Long)].collect()
      rows.foreach { case (h1, h2, r1, r2) =>
        assert(h1 == r1 && h2 == r2)
        // overflow-proof family bound: h1 + 7*h2 stays positive
        assert(h1 + 7 * h2 >= 0)
      }
    }
    it("matches under interpreted execution too") {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val got = Seq("interpreted check").toDF("t")
          .select(portableHash($"t", 5)).as[Long].head()
        val ref = Seq("interpreted check").toDF("t")
          .select(conv(substring(md5(concat(lit("5"), lit(":"), $"t")), 1, 15), 16, 10).cast("long"))
          .as[Long].head()
        assert(got == ref)
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      }
    }
  }
}
