package graft

import graft.functions.JaroWinkler.jaroWinkler
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(jaroWinkler($"a", $"b")).as[Double].head()

  describe("JaroWinklerExpr") {
    it("reproduces the classic literature values") {
      assert(jw("martha", "marhta") == 0.9611111111111111)
      assert(jw("dixon", "dicksonx") == 0.8133333333333332)
      assert(jw("duane", "dwayne") == 0.8400000000000001)
      assert(jw("abc", "cba") == 0.5555555555555555)
    }
    it("identical strings score 1.0; disjoint strings 0.0") {
      assert(jw("widget", "widget") == 1.0)
      assert(jw("abc", "xyz") == 0.0)
    }
    it("empty strings score 0.0 (DuckDB's convention, both-empty included)") {
      assert(jw("", "x") == 0.0)
      assert(jw("x", "") == 0.0)
      assert(jw("", "") == 0.0)
    }
    it("window = max(len)/2 - 1: adjacent swaps in 2-char strings cannot match") {
      assert(jw("ab", "ba") == 0.0)
    }
    it("the Winkler boost applies only above 0.7 and caps the prefix at 4") {
      // jaro("abcdef","abcdxy") = (4/6 + 4/6 + 1)/3 = 7/9 ≈ 0.7778 > 0.7;
      // prefix = 4. Expected value computed through the SAME IEEE op
      // sequence as the implementation (the algebraic 7.0/9 literal is
      // one ulp away — DuckDB agrees with the computed form)
      val jaro = (4.0 / 6 + 4.0 / 6 + 1.0) / 3.0
      val expected = jaro + 4 * 0.1 * (1.0 - jaro)
      assert(jw("abcdef", "abcdxy") == expected)
      // below the 0.7 gate the boost must NOT apply even with a prefix
      val raw = jw("abcdefghij", "abzzzzzzzz")
      assert(raw < 0.7 && raw > 0.0)
    }
    it("is null-safe and symmetric") {
      val out = Seq((Option("abc"), Option.empty[String]))
        .toDF("a", "b").select(jaroWinkler($"a", $"b")).as[Option[Double]].head()
      assert(out.isEmpty)
      assert(jw("dixon", "dicksonx") == jw("dicksonx", "dixon"))
    }
    it("survives whole-stage codegen over a real column pipeline") {
      val names = Seq("small ring", "small rung", "red widget", "blue bolt")
        .toDF("n")
      val cnt = names.as("a").crossJoin(names.as("b"))
        .select(jaroWinkler(col("a.n"), col("b.n")).as("jw"))
        .filter($"jw" >= 0.9 && $"jw" < 1.0).count()
      assert(cnt == 2, "the small ring/rung pair in both directions")
    }
  }
}
