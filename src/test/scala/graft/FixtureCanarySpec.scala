package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift canary (VERDICT r7 #2 / r8 #3): when the driver
  * regenerates `/root/testdata`, encoding changes must fail ONE named
  * spec here — not surface as four opaque bench errors (the round-7
  * NTZ incident: pandas/pyarrow rewrote events.ts from INT64
  * TIMESTAMP(NANOS) to naive µs, and q19/q19b/q46/q55 all went red
  * with no schema-level test to say why).
  *
  * Two layers:
  *  1. `Tables.apply` is exercised against synthetic parquet in all
  *     THREE ts encodings the fixtures have historically used —
  *     int64 nanos (surfaced as LongType under the legacy read flag),
  *     naive µs (TIMESTAMP_NTZ), and zoned TIMESTAMP — asserting the
  *     shaped `ts` is always TimestampType with the same µs instants.
  *  2. The REAL testdata tables' read schemas are pinned column by
  *     column. A regenerated fixture with a new encoding, a renamed or
  *     retyped column fails the exact table's assertion by name.
  */
class FixtureCanarySpec extends SparkSpec {
  import spark.implicits._

  private val usInstants = Seq(1700000000000000L, 1700000123456789L, 1712345678901234L)

  private def shapedTs(dir: String): Seq[Long] = {
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables must shape events.ts to TIMESTAMP, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
  }

  describe("Tables.apply ts-encoding canary") {
    it("shapes int64-nanos ts (legacy nanosAsLong read) to TIMESTAMP") {
      // the nanos fixture surfaces as a raw LongType column under
      // spark.sql.legacy.parquet.nanosAsLong=true — written here
      // directly as long nanos, which reads identically
      val dir = Files.createTempDirectory("canary_nanos").toString
      usInstants.map(us => (us * 1000L, "view")).toDF("ts", "event_type")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      assert(shapedTs(dir) == usInstants.sorted)
    }
    it("shapes naive-µs ts (TIMESTAMP_NTZ — the current fixtures) to TIMESTAMP") {
      val dir = Files.createTempDirectory("canary_ntz").toString
      usInstants.map(us => (java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC), "view"))
        .toDF("ts", "event_type")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      assert(shapedTs(dir) == usInstants.sorted)
    }
    it("passes zoned TIMESTAMP ts through unchanged") {
      val dir = Files.createTempDirectory("canary_tz").toString
      // precise µs instants via timestamp_micros (java.sql.Timestamp
      // literals would truncate to ms)
      usInstants.toDF("us").select(timestamp_micros(col("us")).as("ts"),
          lit("view").as("event_type"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      assert(shapedTs(dir) == usInstants.sorted)
    }
  }

  describe("testdata read-schema pins (sf0.001)") {
    val d = "/root/testdata/sf0.001"

    def pin(table: String, expect: Seq[(String, DataType)]): Unit =
      it(s"$table reads with the pinned schema") {
        val got = Tables(spark, d, table).schema.map(f => (f.name, f.dataType))
        assert(got == expect,
          s"$table schema drifted:\n  got    $got\n  expect $expect")
      }

    pin("region", Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    pin("nation", Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    pin("customer", Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    pin("supplier", Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    pin("part", Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
    // o_orderdate / l_shipdate stay TIMESTAMP_NTZ on purpose: their
    // consumers only compare/truncate (values coerce fine), and a cast
    // would defeat parquet predicate pushdown (Tables scaladoc)
    pin("orders", Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    pin("lineitem", Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
    // events.ts is the shaped column — TIMESTAMP whatever the encoding
    pin("events", Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
    pin("documents", Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType))
    pin("embeddings", Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  describe("df-cap canary (ADVICE r8 / VERDICT r9 #5)") {
    it("the q21/q107 hot-shingle cap cannot bind on any fixture (df ≤ doc count < maxDf)") {
      // A shingle's block-df is bounded by the corpus size, so as long
      // as every fixture holds fewer documents than Dedup.DefaultMaxDf,
      // the capped engine and the UNCAPPED DuckDB oracles are provably
      // identical. A regenerated fixture crossing this line must fail
      // HERE (then: model the df filter in the q21/q107 oracles; q121
      // moved to the guarded plane in round 14 and models its budget-64
      // df filter in its oracle already).
      Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
        val n = Tables(spark, s"/root/testdata/$sf", "documents").count()
        assert(n < graft.ext.Dedup.DefaultMaxDf.toLong,
          s"$sf documents ($n) >= default maxDf ${graft.ext.Dedup.DefaultMaxDf} " +
            "— the cap can now bind; q21/q107 oracles must model the df filter")
      }
    }
    it("directly measured max block-df on sf0.01 stays under the cap with margin") {
      // The direct form of the same canary: compute the actual max
      // (lang, shingle) document frequency with the SAME shingle
      // function the production path uses. Catches any future fixture
      // whose text distribution (not just size) concentrates a shingle,
      // and reports the margin instead of just the bound.
      val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
      val maxDf = docs.select(col("lang"),
          explode(graft.functions.TextFunctions.wordShingleHashes(col("text"), 3))
            .as("sh"))
        .groupBy(col("lang"), col("sh")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).as[Long].head()
      assert(maxDf <= graft.ext.Dedup.DefaultMaxDf.toLong,
        s"max block-df $maxDf exceeds default maxDf ${graft.ext.Dedup.DefaultMaxDf}")
      info(s"sf0.01 max (lang, 3-shingle) df = $maxDf " +
        s"(cap ${graft.ext.Dedup.DefaultMaxDf})")
      // round 14: the guarded pair plane's "exact tier complete at the
      // driver-checked SFs" property needs the much tighter PairDfBudget
      // to not bind here either (measured margins: 5 at sf0.01, 14 at
      // sf0.1, 62 at sf1 vs budget 64). A regenerated fixture crossing
      // THIS line stays oracle-correct (the oracle models the budget)
      // but the q48/q52-family results would start to differ from the
      // plain uncapped plane — fail loudly instead of silently shifting
      // the declared semantics.
      assert(maxDf <= graft.ext.Dedup.PairDfBudget.toLong,
        s"max block-df $maxDf exceeds PairDfBudget ${graft.ext.Dedup.PairDfBudget} " +
          "— the guarded plane's exact tier no longer covers the gate fixtures")
    }
  }

  describe("day-span canary (q216 group-sequential looks)") {
    it("events span >= 10 distinct days on every fixture") {
      // q216 maps its 5 looks onto the day grid via rn = floor(nm*k/5):
      // with nm < 5 look 1 lands on rn = 0 and silently joins nothing,
      // and 5 <= nm < 10 duplicates rn across looks. A regenerated
      // events fixture shrinking the day span must fail HERE with the
      // real reason, not as an opaque q216 row-count mismatch.
      Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
        val nm = Tables(spark, s"/root/testdata/$sf", "events")
          .select(date_trunc("day", col("ts"))).distinct().count()
        assert(nm >= 10L,
          s"$sf events span only $nm distinct days — q216's 5 looks need >= 10 " +
            "for distinct non-zero day indices (5..9 duplicates looks, <5 drops look 1)")
      }
    }
  }

  describe("date-span canary (q210 period split)") {
    it("orders straddle the 1998 policy split on every fixture") {
      // q210's difference-in-differences splits orders at year >= 1998;
      // a regenerated fixture whose date range no longer straddles it
      // would leave one period empty (Spark: 0-row result; oracle:
      // NULL scalar subqueries) and must fail HERE with the real reason
      // instead of as an opaque row-count mismatch.
      Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
        val yrs = Tables(spark, s"/root/testdata/$sf", "orders")
          .agg(min(year(col("o_orderdate"))), max(year(col("o_orderdate"))))
          .head()
        assert(yrs.getInt(0) < 1998 && yrs.getInt(1) >= 1998,
          s"$sf orders span [${yrs.getInt(0)}, ${yrs.getInt(1)}] does not " +
            "straddle 1998 — move q210's policy-date split")
      }
    }
  }
}
