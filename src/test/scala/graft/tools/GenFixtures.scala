package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture generator for SFs the driver does not ship
  * (VERDICT r10 #1: the engine's int64/128-bit overflow claims have never
  * executed past sf0.1's 600k rows — generate sf1 and run the full suite).
  *
  * Mirrors the driver fixtures' schemas and measured distributions
  * (FIXTURES.md §A; profiled off /root/testdata/sf0.1):
  *  - all fields independent; keys dense 0..n-1; dims uniform categorical
  *  - orders spans 1995-01-01..2001-08-01 (straddles q210's 1998 split),
  *    lineitem ships 1995-01-02..2001-11-04, independent of order date
  *  - lineitem rows = 4x orders with uniformly random l_orderkey
  *    (Poisson(4) lines/order, ~1.8% childless orders — as measured)
  *  - events: ts uniform over 2024-01 (30 days — q216/q218 need the full
  *    month of distinct days), value ~ Exp(mean 50) rounded to 2dp
  *    (q170/q223 calibrate on [0,600]), user_id over 15000*sf users
  *  - documents: 10..100 words over the same 31-word vocab, en 40% /
  *    de,es,fr,zh 15% each, ~0.2% exact dups + ~0.3% near dups (one
  *    appended word) against a block anchor so dedup queries see both
  *  - embeddings: 64-dim iid gaussian, L2-normalized, float32, label 0..9
  *
  * Everything derives from xxhash64(id, salt) so the output is identical
  * at any parallelism. Timestamps are written TIMESTAMP_NTZ like the
  * driver files (DuckDB reads them naive; Tables shapes events.ts).
  * Each table lands as a SINGLE `<name>.parquet` FILE (the check.py /
  * bench_duckdb.py path contract).
  *
  * Usage: sbt "Test/runMain graft.tools.GenFixtures <sf> <outDir>"
  */
object GenFixtures {

  private val Two52 = (1L << 52).toDouble

  /** Uniform [0,1) as a pure function of (seed columns, salt). */
  private def u(salt: Int, seed: Column*): Column =
    shiftrightunsigned(xxhash64((seed :+ lit(salt)): _*), 12)
      .cast("double") / lit(Two52)

  /** Uniform long in [0, n) as a pure function of (seed columns, salt). */
  private def ui(salt: Int, n: Long, seed: Column*): Column =
    pmod(xxhash64((seed :+ lit(salt)): _*), lit(n))

  private def pick(salt: Int, choices: Seq[String], seed: Column): Column =
    element_at(array(choices.map(lit): _*),
      (ui(salt, choices.size.toLong, seed) + 1L).cast("int"))

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(1.0)
    val out = args.lift(1).getOrElse(s"/root/repo/fixtures/sf$sf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, sf, out)
    spark.stop()
  }

  def write(spark: SparkSession, sf: Double, out: String): Unit = {
    import spark.implicits._

    Files.createDirectories(Paths.get(out))
    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    val nSupp = n(10000); val nPart = n(200000); val nCust = n(150000)
    val nOrd = n(1500000); val nLi = nOrd * 4; val nEv = n(1000000)
    val nUsers = n(15000)
    val nDoc = math.max(500L, n(50000)); val nEmb = math.max(500L, n(20000))

    /** Spark writes a directory; the fixture contract is a single file —
      * move the lone part file to `<out>/<name>.parquet`. */
    def save(df: DataFrame, name: String): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      require(part.length == 1, s"$name: expected 1 part file, got ${part.length}")
      Files.move(part.head.toPath, Paths.get(s"$out/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      println(s"[gen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    def id: Column = col("id")
    def ntzDate(base: String, spanDays: Long, salt: Int): Column =
      date_add(to_date(lit(base)), ui(salt, spanDays, id).cast("int"))
        .cast("timestamp_ntz")

    // region/nation are constant across SFs — copy the driver's verbatim
    save(spark.read.parquet("/root/testdata/sf0.1/region.parquet"), "region")
    save(spark.read.parquet("/root/testdata/sf0.1/nation.parquet"), "nation")

    save(spark.range(nCust).select(
      id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      ui(1, 25, id).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u(2, id) * 11000.0, 2).as("c_acctbal"),
      pick(3, Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"), id).as("c_mktsegment")), "customer")

    save(spark.range(nSupp).select(
      id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      ui(4, 25, id).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u(5, id) * 11000.0, 2).as("s_acctbal")), "supplier")

    val adjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
    val nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
    save(spark.range(nPart).select(
      id.as("p_partkey"),
      concat_ws(" ", pick(6, adjs, id), pick(7, nouns, id)).as("p_name"),
      concat(lit("Brand#"), (ui(8, 25, id) + 1L).cast("string")).as("p_brand"),
      pick(9, Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"),
        id).as("p_type"),
      (ui(10, 50, id) + 1L).cast("int").as("p_size"),
      round(lit(900.0) + u(11, id) * 100.0, 2).as("p_retailprice")), "part")

    save(spark.range(nOrd).select(
      id.as("o_orderkey"),
      ui(12, nCust, id).as("o_custkey"),
      pick(13, Seq("F", "O", "P"), id).as("o_orderstatus"),
      round(lit(1000.0) + u(14, id) * 499000.0, 2).as("o_totalprice"),
      ntzDate("1995-01-01", 2405, 15).as("o_orderdate"),
      pick(16, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW"), id).as("o_orderpriority")), "orders")

    save(spark.range(nLi).select(
      ui(17, nOrd, id).as("l_orderkey"),
      ui(18, nPart, id).as("l_partkey"),
      ui(19, nSupp, id).as("l_suppkey"),
      (ui(20, 7, id) + 1L).cast("int").as("l_linenumber"),
      (ui(21, 50, id) + 1L).cast("double").as("l_quantity"),
      round(lit(900.0) + u(22, id) * 104100.0, 2).as("l_extendedprice"),
      round(ui(23, 11, id).cast("double") * 0.01, 2).as("l_discount"),
      round(ui(24, 9, id).cast("double") * 0.01, 2).as("l_tax"),
      pick(25, Seq("A", "N", "R"), id).as("l_returnflag"),
      pick(26, Seq("F", "O"), id).as("l_linestatus"),
      ntzDate("1995-01-02", 2499, 27).as("l_shipdate")), "lineitem")

    save(spark.range(nEv).select(
      id.as("event_id"),
      timestamp_micros(lit(1704067200000000L) // 2024-01-01T00:00:00Z
        + ui(28, 30L * 86400L * 1000000L, id)).cast("timestamp_ntz").as("ts"),
      ui(29, nUsers, id).as("user_id"),
      pick(30, Seq("click", "error", "purchase", "signup", "view"), id)
        .as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - u(31, id)), 2).as("value"),
      format_string("{\"k\": %d}", ui(32, 100, id)).as("props")), "events")

    // documents: text is a pure function of a SEED id; a small fraction of
    // docs reuse their 250-block anchor's seed (exact dup) or reuse it and
    // append one id-salted word (near dup) so dedup operators see structure
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    val sel = ui(40, 1000, id)
    val anchor = (id.cast("long") / 250L).cast("long") * 250L
    val seed = when(sel < 5, anchor).otherwise(id)
    val nw = ui(41, 91, seed) + 10L
    val baseWords = transform(sequence(lit(1), nw.cast("int")),
      i => element_at(array(vocab.map(lit): _*),
        (pmod(xxhash64(seed, i, lit(42)), lit(vocab.size.toLong)) + 1L)
          .cast("int")))
    val words = when(sel >= 2 && sel < 5,
      concat(baseWords, array(pick(45, vocab, id)))).otherwise(baseWords)
    save(spark.range(nDoc).select(
      id.as("doc_id"),
      concat_ws(" ", words).as("text"),
      when(ui(43, 20, seed) < 8, "en").otherwise(
        pick(44, Seq("de", "es", "fr", "zh"), seed)).as("lang"),
      concat(lit("src"), ui(46, 20, id).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars")), "documents")

    // embeddings: Box-Muller gaussians per dim, then L2-normalize, float32
    val raw = transform(sequence(lit(0), lit(63)), j => {
      val u1 = shiftrightunsigned(xxhash64(id, j, lit(50)), 12)
        .cast("double") / lit(Two52)
      val u2 = shiftrightunsigned(xxhash64(id, j, lit(51)), 12)
        .cast("double") / lit(Two52)
      sqrt(lit(-2.0) * log(greatest(u1, lit(1e-300)))) *
        cos(lit(2.0 * math.Pi) * u2)
    })
    save(spark.range(nEmb)
      .withColumn("raw", raw)
      .withColumn("nrm", sqrt(aggregate(col("raw"), lit(0.0),
        (acc, x) => acc + x * x)))
      .select(
        id.as("vec_id"),
        transform(col("raw"), x => x / col("nrm")).cast("array<float>")
          .as("embedding"),
        ui(52, 10, id).cast("int").as("label")), "embeddings")
  }
}
