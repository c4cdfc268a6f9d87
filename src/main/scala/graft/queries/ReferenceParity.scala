package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Num._
import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-checked queries covering the reference's operator inventory
  * (SURVEY.md §2), re-expressed over the driver fixtures (FIXTURES.md §A).
  * Every aggregate double goes through Num.dsum (exact decimal) so Spark
  * and DuckDB hash-match regardless of partition order.
  */
object ReferenceParity {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q01_scan_project",
      "S-scan + P2/P6 schema-tolerant project/rename + per-row derived col (main.py:54-83)",
      (s, d) => {
        val li = t(s, d, "lineitem").filter(col("l_quantity") > 45)
        // 'l_ghost' exercises the silently-dropped-absent-column path.
        Relational.tolerantSelect(li, Seq(
          "l_orderkey" -> "okey", "l_linenumber" -> "line_no",
          "l_quantity" -> "qty", "l_extendedprice" -> "price",
          "l_ghost" -> "ghost"))
          .withColumn("gross", col("qty") * col("price"))
      },
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line_no, l_quantity AS qty, l_extendedprice AS price, l_quantity * l_extendedprice AS gross FROM lineitem WHERE l_quantity > 45""")),

    QueryDef("q02_filter_events",
      "F1 boolean/equality + range predicate (main.py:127, 30-34)",
      (s, d) => t(s, d, "events")
        .filter(col("event_type") === "purchase" && col("value") > 50)
        .select("event_id", "user_id", "value"),
      Some("""SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase' AND value > 50""")),

    QueryDef("q03_group_agg",
      "A2/A3/A4 grouped sums + counts, TPC-H Q1 shape (main.py:134-135,159-167)",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
          lcount(lit(1)).as("n_rows")),
      // the money sums route DECIMAL->VARCHAR->DOUBLE: DuckDB's direct
      // DECIMAL->DOUBLE double-rounds (int128->double, then /10^scale)
      // once the unscaled sum passes 2^53 — a 1-ulp divergence from
      // Spark's single-rounded BigDecimal conversion, caught at sf1;
      // the string round-trip is correctly rounded in both engines
      Some("""SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty, CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base, CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_disc, CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    QueryDef("q04_latest_argmax",
      "A1 latest-record argmax keeping ties + A2 sum over winners (main.py:130-135)",
      (s, d) => Relational.latestByKey(
          t(s, d, "lineitem"), Seq(col("l_orderkey")), Seq(col("l_shipdate")))
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("last_qty"),
             lcount(lit(1)).as("n_last")),
      Some("""WITH r AS (SELECT l_orderkey, l_quantity, rank() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC) AS rk FROM lineitem) SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS last_qty, CAST(COUNT(*) AS BIGINT) AS n_last FROM r WHERE rk = 1 GROUP BY l_orderkey""")),

    QueryDef("q05_join_left",
      "J1/J2 left equi-join + F5 aggregate-or-default via coalesce (main.py:182-183,129-153)",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          lcount(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_value"),
          countDistinct(col("c_custkey")).cast("long").as("n_customers")),
      Some("""SELECT c_mktsegment, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders, CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(38,6))) AS DOUBLE) AS total_value, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_mktsegment""")),

    QueryDef("q06_join_broadcast",
      "J1 dimension join, explicitly broadcast (SURVEY §2.4); revenue per brand",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          lcount(lit(1)).as("n_lines")),
      Some("""SELECT p_brand, CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""")),

    QueryDef("q07_cross_tasks",
      "J5 cartesian task table (users × pools driver loop, main.py:11-12)",
      (s, d) => t(s, d, "region")
        .crossJoin(t(s, d, "customer").select(col("c_mktsegment")).distinct())
        .select(col("r_name"), col("c_mktsegment")),
      Some("""SELECT r_name, c_mktsegment FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer)""")),

    QueryDef("q08_positional_zip",
      "J3/J4 horizontal concat = align-by-ordinal join (main.py:102,252)",
      // zipByPosition's global row_number serializes through one task —
      // fine for the dimension-sized frames it models (the reference
      // concats 1-row frames), so the demo feeds it ONLY the 50 rows it
      // will keep: orderBy().limit() reduces each side scale-safely
      // (TakeOrderedAndProject), and ord ≤ 50 of the full zip equals the
      // zip of each side's 50 smallest keys.
      (s, d) => Relational.zipByPosition(
          t(s, d, "supplier").select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
            .orderBy(col("s_suppkey")).limit(50),
          Seq(col("s_suppkey")),
          t(s, d, "customer").select(col("c_custkey"), col("c_name"), col("c_acctbal"))
            .orderBy(col("c_custkey")).limit(50),
          Seq(col("c_custkey")))
        .select(col("ord"), col("s_name"), col("c_name"),
                (col("s_acctbal") + col("c_acctbal")).as("combined")),
      Some("""WITH s AS (SELECT CAST(row_number() OVER (ORDER BY s_suppkey) AS BIGINT) AS ord, s_name, s_acctbal FROM supplier), c AS (SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS ord, c_name, c_acctbal FROM customer) SELECT ord, s_name, c_name, s_acctbal + c_acctbal AS combined FROM s JOIN c USING (ord) WHERE ord <= 50""")),

    QueryDef("q09_string_fold",
      "A5/E14 ordered string aggregation into '(id: x, y; …)' blobs (main.py:163-170,229-244)",
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .groupBy(col("l_orderkey"))
        .agg(Relational.stringFold(
          struct(col("l_linenumber"), col("l_quantity")),
          x => format_string("%d: %d", x.getField("l_linenumber"),
                             floor(x.getField("l_quantity")).cast("long")))
          .as("bins")),
      // ORDER BY must mirror array_sort on struct(l_linenumber, l_quantity):
      // the fixture HAS duplicate line numbers within an order, so the
      // quantity tiebreak is load-bearing for determinism.
      Some("""SELECT l_orderkey, '(' || string_agg(printf('%d: %d', l_linenumber, CAST(FLOOR(l_quantity) AS BIGINT)), '; ' ORDER BY l_linenumber, l_quantity) || ')' AS bins FROM lineitem WHERE l_orderkey <= 500 GROUP BY l_orderkey""")),

    QueryDef("q10_derived_metrics",
      "E1,E5-E13 derived metric columns: value-if-held, guarded %, APR/APY (main.py:198-201,257-286)",
      (s, d) => {
        val byCust = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(dsum(col("o_totalprice")).as("order_value"),
               lcount(lit(1)).as("n_orders"))
        t(s, d, "customer")
          .join(byCust, col("c_custkey") === col("o_custkey"), "left")
          .select(
            col("c_custkey"),
            coalesce(col("order_value"), lit(0.0)).as("order_value"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            (col("c_acctbal") * lit(2.0)).as("value_if_held"),
            (col("c_acctbal") * lit(2.0) - coalesce(col("order_value"), lit(0.0))).as("impermanent_loss"),
            when(col("c_acctbal") =!= 0,
              round(coalesce(col("order_value"), lit(0.0)) / col("c_acctbal") * 100, 4))
              .as("value_pct_of_bal"),
            // daily-yield proxy kept ≤ ~6e-4 so (1+x)^365 stays O(1):
            // pow's last-ulp differences between JVM and DuckDB libm are
            // then far below the round(…,4) grain.
            round((pow(lit(1.0) + coalesce(col("order_value"), lit(0.0)) / lit(1.0e10), 365) - lit(1.0)) * 100, 4)
              .as("apy_pct"))
      },
      Some("""WITH bc AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS order_value, CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey) SELECT c_custkey, COALESCE(order_value, 0.0) AS order_value, COALESCE(n_orders, 0) AS n_orders, c_acctbal * 2.0 AS value_if_held, c_acctbal * 2.0 - COALESCE(order_value, 0.0) AS impermanent_loss, CASE WHEN c_acctbal <> 0 THEN ROUND(COALESCE(order_value, 0.0) / c_acctbal * 100, 4) END AS value_pct_of_bal, ROUND((POW(1.0 + COALESCE(order_value, 0.0) / 10000000000.0, 365) - 1.0) * 100, 4) AS apy_pct FROM customer LEFT JOIN bc ON c_custkey = o_custkey""")),

    QueryDef("q11_json_extract",
      "P4/P7/P8 JSON field pluck + coercion-to-null + default fill (main.py:107-126)",
      (s, d) => {
        val k = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
        t(s, d, "events")
          .select(when(k === "", 0).otherwise(k.cast("int")).as("k"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(lcount(lit(1)).as("n"), lsum(col("k")).as("k_sum"))
      },
      Some("""WITH e AS (SELECT COALESCE(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER), 0) AS k FROM events) SELECT k % 10 AS k_bucket, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS k_sum FROM e GROUP BY k % 10""")),

    QueryDef("q12_day_windows",
      "§2.6 tumbling 1-day time window replacing the API's server-side filterBy=1d (main.py:46-49)",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 day"))
        .agg(lcount(lit(1)).as("n_events"),
             dsum(col("value")).as("value_sum"),
             countDistinct(col("user_id")).cast("long").as("n_users"))
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
                col("n_events"), col("value_sum"), col("n_users")),
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events GROUP BY 1""")),

    QueryDef("q13_running_window",
      "§2.6 running cumulative sum per key (ordered frame, exact decimal)",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast(DecimalType(38, 6)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_value"),
          row_number().over(w).cast("long").as("order_seq"))
      },
      Some("""SELECT o_orderkey, o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value, CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq FROM orders""")),

    QueryDef("q14_topk",
      "T1/T3 deterministic top-k with tiebreak (main.py:130-133)",
      // orderBy().limit() plans as TakeOrderedAndProject: each partition
      // keeps its own top-100, only those merge on one task — vs a
      // partition-less row_number window, which funnels the ENTIRE table
      // through a single task's sort. The rank is derived afterwards by
      // a window over just the k surviving rows.
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .withColumn("rn", row_number()
          .over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))).cast("long")),
      Some("""SELECT o_orderkey, o_totalprice, rn FROM (SELECT o_orderkey, o_totalprice, CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn FROM orders) WHERE rn <= 100""")),

    QueryDef("q15_union_append",
      "K1/§2.8 UNION ALL append-sink semantics (main.py:345-351)",
      (s, d) => {
        val e = t(s, d, "events")
        e.filter(col("event_type") === "view")
          .unionByName(e.filter(col("event_type") === "click"))
          .groupBy(col("event_type"))
          .agg(lcount(lit(1)).as("n"), dsum(col("value")).as("value_sum"))
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum FROM (SELECT * FROM events WHERE event_type = 'view' UNION ALL SELECT * FROM events WHERE event_type = 'click') GROUP BY event_type""")),

    QueryDef("q16_first_per_group",
      "T2 first-row/scalar extraction per group (main.py:138,212)",
      (s, d) => t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(min(col("c_name")).as("first_name"),
             max(col("c_acctbal")).as("max_bal"),
             lcount(lit(1)).as("n")),
      Some("""SELECT c_nationkey, MIN(c_name) AS first_name, MAX(c_acctbal) AS max_bal, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY c_nationkey""")),

    QueryDef("q17_div_guard",
      "E9/E11-E13 guarded division: null (not inf) on zero denominator (main.py:266-269,284-286)",
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))).as("spend"),
             lcount(when(col("event_type") === "error", lit(1))).as("n_errors"))
        .select(col("user_id"), col("spend"), col("n_errors"),
                when(col("n_errors") =!= 0, round(col("spend") / col("n_errors"), 6))
                  .as("spend_per_error")),
      Some("""WITH g AS (SELECT user_id, CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS spend, CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_errors FROM events GROUP BY user_id) SELECT user_id, spend, n_errors, CASE WHEN n_errors <> 0 THEN ROUND(spend / n_errors, 6) END AS spend_per_error FROM g""")),

    QueryDef("q35_shipping_priority",
      "TPC-H Q3 shape: 3-way selective join, grouped revenue, deterministic top-10 (multi-join reorder showcase)",
      (s, d) => {
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = t(s, d, "lineitem").filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          // top-10 via TakeOrderedAndProject (per-partition top-k +
          // merge), not a partition-less window over every group row
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .withColumn("rn", row_number().over(
            Window.orderBy(col("revenue").desc, col("l_orderkey"))).cast("long"))
          .select(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
                  col("o_orderpriority"), col("revenue"), col("rn"))
      },
      Some("""WITH g AS (SELECT l_orderkey, o_orderdate, o_orderpriority, CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate >= TIMESTAMP '1998-01-01' GROUP BY 1, 2, 3) SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority, revenue, rn FROM (SELECT *, CAST(row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS BIGINT) AS rn FROM g) WHERE rn <= 10""")),

    QueryDef("q36_local_supplier_volume",
      "TPC-H Q5 shape: 6-way star join (region→nation→customer/supplier→orders→lineitem), revenue per nation. r13 driver-suite 0.99 s vs r12's 0.66 was spot-profiled in round 14 (VERDICT r13 #4): isolated min-of-6 at sf0.1 = 0.72 s on a loaded box — suite-window variance, no structural regression; the plan is unchanged (two broadcast star sides + one lineitem shuffle)",
      (s, d) => {
        val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        val sup = t(s, d, "supplier")
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
                     col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
               lcount(lit(1)).as("n_lines"))
      },
      Some("""SELECT n_name, CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' GROUP BY n_name""")),

    QueryDef("q37_approx_distinct",
      "approximate aggregates: HLL approx_count_distinct, hash-checked as exact count + a within-5% accuracy bound (the sketch estimate itself is engine-specific)",
      (s, d) => t(s, d, "lineitem")
        // two-level distinct instead of countDistinct-next-to-HLL in one
        // agg: the mixed form plans an Expand that DUPLICATES every scan
        // row into distinct/non-distinct branches (2× a 100 TB scan);
        // the pre-dedup level gets map-side partial dedup instead, and
        // HLL is duplicate-insensitive so its estimate is unchanged
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        // count(col) skips the (flag, NULL) distinct row — matching the
        // oracle's COUNT(DISTINCT l_partkey) null semantics — while the
        // row itself still keeps an all-null group alive
        .agg(count(col("l_partkey")).cast("long").as("exact_parts"),
             approx_count_distinct(col("l_partkey"), 0.02).cast("long").as("approx"))
        .select(col("l_returnflag"), col("exact_parts"),
                (abs(col("approx") - col("exact_parts")).cast("double") /
                 col("exact_parts") <= 0.05).as("within_5pct")),
      Some("""SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts, TRUE AS within_5pct FROM lineitem GROUP BY l_returnflag""")),

    QueryDef("q50_eip55_checksum",
      "E21 EIP-55 mixed-case address checksum via native Keccak-256 expression (main.py:206,211). Oracle: the full Keccak-f[1600] permutation UNROLLED into generated DuckDB SQL (24 rounds over HUGEINT lanes — see KeccakOracle), so even the checksum hash-matches; the deterministic 1-in-11 subset keeps the ~1 ms/row SQL emulation from distorting the oracle suite's wall-clock (operator correctness is also pinned by Eip55Spec's EIP vectors)",
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") % 11 === 0)
        .select(
          col("c_custkey"),
          graft.functions.Eip55.eip55_checksum(
            concat(substring(md5(col("c_name").cast("binary")), 1, 20),
                   substring(md5(col("c_custkey").cast("string").cast("binary")), 1, 20)))
            .as("checksummed")),
      Some(KeccakOracle.eip55Sql(
        idExpr = "c_custkey", idName = "c_custkey",
        addrExpr = "substr(md5(c_name), 1, 20) || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 20)",
        fromClause = "customer WHERE c_custkey % 11 = 0"))),

    QueryDef("q18_decimal_mul",
      "E2/E3 exact wide-decimal products (uint256-style bin math, main.py:232-238)",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
                  col("l_quantity").cast(DecimalType(18, 2)))
               .cast(DecimalType(38, 4)))
             .cast("double").as("exact_product_sum"),
             lcount(lit(1)).as("n")),
      Some("""SELECT l_returnflag, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS exact_product_sum, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag"""))
  )
}
