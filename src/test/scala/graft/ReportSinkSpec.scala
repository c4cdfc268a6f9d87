package graft

import graft.sinks.ReportSink
import java.nio.file.Files
import org.apache.spark.sql.functions.{max, min, shiftright}
import scala.jdk.CollectionConverters._

class ReportSinkSpec extends SparkSpec {
  import spark.implicits._

  describe("appendCsvSingleFile (K1 fidelity)") {
    it("writes the header exactly once across appends") {
      val target = Files.createTempDirectory("sink").resolve("merged_data.csv").toString
      val batch1 = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
      val batch2 = Seq((3L, "c", 3.5)).toDF("id", "name", "v")
      ReportSink.appendCsvSingleFile(batch1, target)
      ReportSink.appendCsvSingleFile(batch2, target)
      val lines = Files.readAllLines(java.nio.file.Paths.get(target)).asScala.toList
      assert(lines.head == "id,name,v")
      assert(lines.count(_ == "id,name,v") == 1)
      assert(lines.drop(1).toSet == Set("1,a,1.5", "2,b,2.5", "3,c,3.5"))
    }
    it("quotes header names containing commas (report columns contain %[]())") {
      val target = Files.createTempDirectory("sink").resolve("weird.csv").toString
      val df = Seq((1.0, 2.0)).toDF("APR%", "fees_per_bin(bin_id: token_x, token_y_amounts)")
      ReportSink.appendCsvSingleFile(df, target)
      val header = Files.readAllLines(java.nio.file.Paths.get(target)).asScala.head
      assert(header == "APR%,\"fees_per_bin(bin_id: token_x, token_y_amounts)\"")
    }
  }

  describe("appendAtomicBatch (commit-protocol append)") {
    it("a failed write leaves no partial data visible; retry replaces, never duplicates") {
      val path = Files.createTempDirectory("asink").resolve("report").toString
      // nothing committed yet → no schema to offer
      assert(ReportSink.readCommittedBatches(spark, path).isEmpty)

      val b1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("day", "v")
      ReportSink.appendAtomicBatch(b1, path, "b1", Seq("day"))
      assert(ReportSink.readCommittedBatches(spark, path).get.count() == 2)

      // simulate a job that died between writing files and job commit:
      // data files exist, the _SUCCESS commit marker does not
      val b2 = Seq(("2024-01-03", 3L)).toDF("day", "v")
      ReportSink.appendAtomicBatch(b2, path, "b2", Seq("day"))
      val marker = java.nio.file.Paths.get(path, "batch=b2", "_SUCCESS")
      java.nio.file.Files.delete(marker)
      val visible = ReportSink.readCommittedBatches(spark, path).get
      assert(visible.count() == 2, "uncommitted batch must be invisible to readers")
      assert(!visible.select("day").as[String].collect().contains("2024-01-03"))

      // the RETRY of b2 overwrites its directory: the earlier partial
      // files are gone, the batch commits, and nothing is double-counted
      ReportSink.appendAtomicBatch(b2, path, "b2", Seq("day"))
      val after = ReportSink.readCommittedBatches(spark, path).get
      assert(after.count() == 3)
      assert(after.filter($"day" === "2024-01-03").count() == 1)
      // batch + partition columns surface through basePath discovery
      assert(after.columns.toSet == Set("v", "day", "batch"))
    }
  }

  describe("appendPartitioned (production sink)") {
    it("accumulates batches as partitioned parquet (union-all semantics)") {
      val path = Files.createTempDirectory("psink").resolve("report").toString
      val b1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("day", "v")
      val b2 = Seq(("2024-01-02", 3L)).toDF("day", "v")
      ReportSink.appendPartitioned(b1, path, Seq("day"))
      ReportSink.appendPartitioned(b2, path, Seq("day"))
      val back = spark.read.parquet(path)
      assert(back.count() == 3)
      // partition pruning: reading one day touches one partition dir
      assert(back.filter($"day" === "2024-01-02").count() == 2)
      assert(new java.io.File(path).listFiles().count(_.getName.startsWith("day=")) == 2)
    }
    it("writeHashSharded: shard dirs, in-file sort, null routing, shard-column guard") {
      val path = Files.createTempDirectory("hsink").resolve("corpus").toString
      val df = Seq[(java.lang.Long, String)](
        (1L, "b"), (2L, "a"), (3L, "c"), (4L, "d"), (5L, "e"),
        (null, "z") // null key must land in shard 0, not HIVE_DEFAULT
      ).toDF("doc_id", "text")
      val colName = ReportSink.writeHashSharded(df, path, nShards = 4,
        keyCol = "doc_id", sortCols = Seq("doc_id"))
      assert(colName == "shard")
      val dirs = new java.io.File(path).listFiles().map(_.getName)
        .filter(_.startsWith("shard=")).sorted.toSeq
      assert(dirs.nonEmpty && dirs.forall(d => (0 until 4).exists(i => d == s"shard=$i")),
        s"unexpected shard dirs: $dirs")
      assert(!dirs.contains("shard=__HIVE_DEFAULT_PARTITION__"))
      // assignment matches the pure shardOf expression row by row
      val back = spark.read.parquet(path)
      val expected = df.select($"doc_id", $"text",
        ReportSink.shardOf($"doc_id", 4).as("shard"))
      assert(back.count() == 6)
      assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
      // null key routed deterministically to shard 0
      assert(back.filter($"text" === "z").select($"shard").as[Long].head() == 0L)
      // rows inside each shard's files arrive sorted by the sort key
      val shard0Files = new java.io.File(path + "/shard=0").listFiles()
        .filter(_.getName.startsWith("part-"))
      shard0Files.foreach { f =>
        val ids = spark.read.parquet(f.getPath)
          .select($"doc_id").as[java.lang.Long].collect().toSeq
        // Spark's asc ordering puts nulls first
        assert(ids == ids.sortBy(i => (i != null, Option(i).map(_.longValue).getOrElse(0L))),
          s"in-file order not sorted: $ids")
      }
      // derived column must never silently replace user data
      val clash = Seq((1L, 9L)).toDF("doc_id", "shard")
      assertThrows[IllegalArgumentException] {
        ReportSink.writeHashSharded(clash, path + "2", 4, "doc_id", Nil)
      }
    }
    it("writeZOrdered: known interleavings, disjoint per-dir z-ranges, lossless roundtrip") {
      // hand-checked Morton keys: x bits land even, y bits odd
      val k = Seq(
        ((3, 1), 7L),   // x=0b11 -> 1+4; y=0b01 -> 2
        ((2, 2), 12L),  // x bit1 -> 4; y bit1 -> 8
        ((0, 3), 10L),  // y=0b11 -> 2+8
        ((255, 0), 0x5555L),
        ((0, 255), 0xAAAAL)
      )
      val kdf = k.map(_._1).toDF("x", "y")
        .select(ReportSink.zOrderKey($"x", $"y", 8).as("z")).as[Long].collect().toSeq
      assert(kdf == k.map(_._2))

      val path = Files.createTempDirectory("zsink").resolve("corpus").toString
      val df = (0 until 256).map(i => (i.toLong, (i * 7) % 256, (i * 13) % 256))
        .toDF("id", "sx", "px")
      val colName = ReportSink.writeZOrdered(df, path, "sx", "px",
        bits = 8, fileBits = 4)
      assert(colName == "zfile")
      val back = spark.read.parquet(path)
      // lossless roundtrip and file assignment = zkey >> (16 - 4)
      assert(back.count() == 256)
      val expected = df.withColumn("zfile",
        shiftright(ReportSink.zOrderKey($"sx", $"px", 8), 12).cast("long"))
      assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
      // per-dir z-ranges are CONTIGUOUS and DISJOINT: max z of dir i
      // sits below min z of dir i+1 — the property min/max pruning needs
      val ranges = back
        .select($"zfile", ReportSink.zOrderKey($"sx", $"px", 8).as("z"))
        .groupBy($"zfile").agg(min($"z").as("mn"), max($"z").as("mx"))
        .orderBy($"zfile").as[(Long, Long, Long)].collect()
      ranges.sliding(2).foreach {
        case Array(a, b) => assert(a._3 < b._2,
          s"z-ranges overlap across dirs: $a vs $b")
        case _ =>
      }
    }

    it("supports ORC with identical partitioned union-all semantics") {
      val path = Files.createTempDirectory("osink").resolve("report").toString
      val b1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("day", "v")
      val b2 = Seq(("2024-01-02", 3L)).toDF("day", "v")
      ReportSink.appendPartitioned(b1, path, Seq("day"), format = "orc")
      ReportSink.appendPartitioned(b2, path, Seq("day"), format = "orc")
      val back = spark.read.orc(path)
      assert(back.count() == 3)
      assert(back.filter($"day" === "2024-01-02")
        .as[(Long, String)].collect().map(_._1).sorted.toSeq == Seq(2L, 3L))
    }
  }
}
