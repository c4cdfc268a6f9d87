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
