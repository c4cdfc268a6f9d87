package graft

import graft.functions.RollingMinHash
import graft.functions.RollingMinHash.rolling_min_hash
import org.apache.spark.sql.functions._

class RollingMinHashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference implementation (plain Scala, no sharing with
    * the expression's helper beyond the algorithm definition). */
  private def reference(s: String, w: Int): Long = {
    val b = s.getBytes("UTF-8")
    if (b.isEmpty) return 0L
    val win = math.min(w, b.length)
    val hashes = b.sliding(win).map(_.foldLeft(0L)((h, x) => h * 257L + (x & 0xff)))
    hashes.reduce((a, c) => if (java.lang.Long.compareUnsigned(c, a) < 0) c else a)
  }

  describe("RollingMinHash expression") {
    it("matches the reference implementation (codegen path)") {
      val inputs = Seq("hello world, this is a document", "abc", "", "aaaa", "日本語テキスト")
      val got = inputs.toDF("t")
        .select(rolling_min_hash($"t", 8)).as[Long].collect().toSeq
      assert(got == inputs.map(reference(_, 8)))
    }
    it("matches under interpreted (codegen disabled) execution") {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val got = Seq("winnowing fingerprint test 123").toDF("t")
          .select(rolling_min_hash($"t", 8)).as[Long].head()
        assert(got == reference("winnowing fingerprint test 123", 8))
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      }
    }
    it("superstring min-hash is unsigned-≤ the original (window superset)") {
      val a = "the quick brown fox jumps over the lazy dog"
      val b = a + " APPENDED TAIL"
      val Seq(ha, hb) = Seq(a, b).toDF("t")
        .select(rolling_min_hash($"t", 8)).as[Long].collect().toSeq
      // every window of `a` is also a window of `b`, so min can only drop
      assert(java.lang.Long.compareUnsigned(hb, ha) <= 0)
    }
    it("registers as a SQL function") {
      RollingMinHash.register(spark)
      val viaSql = spark.sql("SELECT rolling_min_hash('hello world', 4) AS h")
        .as[Long].head()
      assert(viaSql == reference("hello world", 4))
    }
  }
}
