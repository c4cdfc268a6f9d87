package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch profiling main (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"[prof] $tag%-14s ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    def sh(): DataFrame = graft.ops.Parallelize.forCompute(docs)
      .select(col("doc_id").as("id"), col("lang").as("block"),
              wordShingles(col("text"), 3).as("ss"))
      .select(col("id"), col("block"), size(col("ss")).as("n_sh"), explode(col("ss")).as("s"))
      .select(col("id"), col("block"), col("n_sh"), xxhash64(col("s")).as("sh"))

    // V1: struct posting lists, sorted (current)
    def v1(): DataFrame = {
      val lists = sh().groupBy(col("block"), col("sh"))
        .agg(array_sort(collect_list(struct(col("id"), col("n_sh")))).as("ids"))
        .filter(size(col("ids")) > 1)
      val pairs = lists.select(explode(flatten(
        transform(sequence(lit(1), size(col("ids")) - 1), i =>
          transform(sequence(i + 1, size(col("ids"))), j =>
            struct(element_at(col("ids"), i).getField("id").as("id_a"),
                   element_at(col("ids"), i).getField("n_sh").as("na"),
                   element_at(col("ids"), j).getField("id").as("id_b"),
                   element_at(col("ids"), j).getField("n_sh").as("nb")))))).as("p"))
        .select(col("p.id_a"), col("p.na"), col("p.id_b"), col("p.nb"))
      pairs.groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("ic"))
        .select(col("id_a"), col("id_b"),
                (col("ic").cast("double") / (col("na") + col("nb") - col("ic"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    // V2: packed longs (id * 2^24 + n_sh), codegen'd long sort
    def v2(): DataFrame = {
      val P = 1L << 24
      val packed = sh().select(col("block"), col("sh"),
        (col("id") * P + col("n_sh")).as("pk"))
      val lists = packed.groupBy(col("block"), col("sh"))
        .agg(array_sort(collect_list(col("pk"))).as("ids"))
        .filter(size(col("ids")) > 1)
      val pairs = lists.select(explode(flatten(
        transform(sequence(lit(1), size(col("ids")) - 1), i =>
          transform(sequence(i + 1, size(col("ids"))), j =>
            struct(element_at(col("ids"), i).as("pa"),
                   element_at(col("ids"), j).as("pb")))))).as("p"))
        .select(col("p.pa"), col("p.pb"))
      pairs.groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("ic"))
        .select((col("pa") / P).cast("long").as("id_a"),
                (col("pb") / P).cast("long").as("id_b"),
                (col("ic").cast("double") /
                 (pmod(col("pa"), lit(P)) + pmod(col("pb"), lit(P)) - col("ic"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    // V3: original — plain id lists + count joins
    def v3(): DataFrame = {
      val s = sh()
      val cnt = s.groupBy(col("id")).agg(count(lit(1)).as("n_sh2"))
      val lists = s.groupBy(col("block"), col("sh"))
        .agg(array_sort(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      val pairs = lists.select(explode(flatten(
        transform(sequence(lit(1), size(col("ids")) - 1), i =>
          transform(sequence(i + 1, size(col("ids"))), j =>
            struct(element_at(col("ids"), i).as("id_a"),
                   element_at(col("ids"), j).as("id_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
      val inter = pairs.groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ic"))
      inter
        .join(cnt.select(col("id").as("id_a"), col("n_sh2").as("na")), Seq("id_a"))
        .join(cnt.select(col("id").as("id_b"), col("n_sh2").as("nb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
                (col("ic").cast("double") / (col("na") + col("nb") - col("ic"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    // V4: struct lists + Generate-based pair expansion (no nested lambdas)
    def v4(): DataFrame = {
      val lists = sh().groupBy(col("block"), col("sh"))
        .agg(array_sort(collect_list(struct(col("id"), col("n_sh")))).as("ids"))
        .filter(size(col("ids")) > 1)
      val left = lists.select(col("ids"), posexplode(col("ids")))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "a")
      val pairs = left.select(
        col("a.id").as("id_a"), col("a.n_sh").as("na"),
        explode(slice(col("ids"), col("i") + lit(2),
                      greatest(size(col("ids")) - col("i") - 1, lit(0)))).as("b"))
        .select(col("id_a"), col("na"), col("b.id").as("id_b"), col("b.n_sh").as("nb"))
      pairs.groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("ic"))
        .select(col("id_a"), col("id_b"),
                (col("ic").cast("double") / (col("na") + col("nb") - col("ic"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }
    // incremental stage timing of the v1 pipeline (warm: run each twice)
    def stages(): Unit = {
      def shingled(): DataFrame = graft.ops.Parallelize.forCompute(docs)
        .select(col("doc_id").as("id"), col("lang").as("block"),
                wordShingles(col("text"), 3).as("ss"))
      def tok(): DataFrame = graft.ops.Parallelize.forCompute(docs)
        .select(col("doc_id").as("id"), tokens(col("text")).as("ss"))
      def exploded(): DataFrame = sh()
      def lists(): DataFrame = sh().groupBy(col("block"), col("sh"))
        .agg(array_sort(collect_list(struct(col("id"), col("n_sh")))).as("ids"))
        .filter(size(col("ids")) > 1)
      for (r <- 1 to 2) {
        time(s"scan_$r")(noop(docs.select(col("doc_id"), col("lang"), col("text"))))
        time(s"tokens_$r")(noop(tok()))
        time(s"shingle_$r")(noop(shingled()))
        time(s"explode_$r")(noop(exploded()))
        time(s"lists_$r")(noop(lists()))
        time(s"full_$r")(noop(v1()))
      }
    }
    // job/stage/task accounting for one warm run
    def listen(): Unit = {
      noop(v1()) // warm
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stg = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val taskNs = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs.incrementAndGet()
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = stg.incrementAndGet()
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(); taskNs.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
        }
      }
      spark.sparkContext.addSparkListener(l)
      time("listen_run")(noop(v1()))
      spark.sparkContext.removeSparkListener(l)
      Thread.sleep(500)
      println(f"[prof] jobs=${jobs.get} stages=${stg.get} tasks=${tasks.get} sumTaskTime=${taskNs.get / 1e9}%.2f s")
    }

    // per-step task-CPU attribution
    def cpu(): Unit = {
      def measure(tag: String)(mk: => DataFrame): Unit = {
        noop(mk) // warm
        val taskNs = new java.util.concurrent.atomic.AtomicLong
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            taskNs.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
        }
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime; noop(mk)
        val wall = (System.nanoTime - t0) / 1e9
        spark.sparkContext.removeSparkListener(l)
        Thread.sleep(300)
        println(f"[prof] $tag%-14s wall=$wall%.2f cpu=${taskNs.get / 1e9}%.2f s")
      }
      measure("tokens") {
        graft.ops.Parallelize.forCompute(docs)
          .select(col("doc_id").as("id"), tokens(col("text")).as("ss"))
      }
      measure("shingles") {
        graft.ops.Parallelize.forCompute(docs)
          .select(col("doc_id").as("id"), wordShingles(col("text"), 3).as("ss"))
      }
      measure("sh_explode")(sh())
      measure("full")(v1())
    }
    // V5: packed longs + Generate-based expansion (no lambdas, no structs)
    def v5(): DataFrame = {
      val P = 1L << 24
      val packed = sh().select(col("block"), col("sh"),
        (col("id") * P + col("n_sh")).as("pk"))
      val lists = packed.groupBy(col("block"), col("sh"))
        .agg(array_sort(collect_list(col("pk"))).as("ids"))
        .filter(size(col("ids")) > 1)
      val left = lists.select(col("ids"), posexplode(col("ids")))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "pa")
      val pairs = left.select(col("pa"),
        explode(slice(col("ids"), col("i") + lit(2),
                      greatest(size(col("ids")) - col("i") - 1, lit(0)))).as("pb"))
      pairs.groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("ic"))
        .select((col("pa") / P).cast("long").as("id_a"),
                (col("pb") / P).cast("long").as("id_b"),
                (col("ic").cast("double") /
                 (pmod(col("pa"), lit(P)) + pmod(col("pb"), lit(P)) - col("ic"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    // V6: plain self-join on (block, sh) — two exchanges, full codegen
    def v6(): DataFrame = {
      val s = sh()
      val a = s.select(col("block"), col("sh"), col("id").as("id_a"), col("n_sh").as("na"))
      val b = s.select(col("block"), col("sh"), col("id").as("id_b"), col("n_sh").as("nb"))
      val pairs = a.join(b, Seq("block", "sh")).filter(col("id_a") < col("id_b"))
      pairs.groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("ic"))
        .select(col("id_a"), col("id_b"),
                (col("ic").cast("double") / (col("na") + col("nb") - col("ic"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }

    def ab(): Unit = {
      def measure(tag: String)(mk: => DataFrame): Unit = {
        noop(mk)
        val t0 = System.nanoTime; noop(mk); val t1 = System.nanoTime; noop(mk)
        val w = math.min((t1 - t0) / 1e9, (System.nanoTime - t1) / 1e9)
        println(f"[prof] $tag%-14s min-warm=$w%.2f s")
      }
      measure("v1_struct")(v1())
      measure("v2_packed")(v2())
      measure("v4_generate")(v4())
      measure("v5_packgen")(v5())
      measure("v6_selfjoin")(v6())
      println("[prof] v5 diff = " + v5().exceptAll(v1()).count() + "/" + v1().exceptAll(v5()).count())
      println("[prof] v6 diff = " + v6().exceptAll(v1()).count() + "/" + v1().exceptAll(v6()).count())
    }
    args.headOption.getOrElse("v1") match {
      case "ab" => ab()
      case "stages" => stages()
      case "listen" => listen()
      case "cpu" => cpu()
      case "v1" => time("v1_cold")(noop(v1())); time("v1_warm")(noop(v1()))
      case "v2" => time("v2_cold")(noop(v2())); time("v2_warm")(noop(v2()))
      case "v3" => time("v3_cold")(noop(v3())); time("v3_warm")(noop(v3()))
      case "v4" => time("v4_cold")(noop(v4())); time("v4_warm")(noop(v4()))
      case "v4check" => println("[prof] v4 diff = " + v4().exceptAll(v1()).count() + "/" + v1().exceptAll(v4()).count())
    }
    spark.stop()
  }
}
