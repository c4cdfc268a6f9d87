package graft

import java.nio.file.Files

class FixtureSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("fixture-src").toFile
    val f = new java.io.File(d, "history.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"user_address":"U1","poolAddress":"P1","timestamp":"2024-01-05 10:00:00","isDeposit":true,"blockNumber":100,"tokenX":{"amount":"1.5","price":"24.0"},"tokenY":{"amount":"100","price":"1.0"}}""")
    w.println("""{"user_address":"U1","poolAddress":"P1","timestamp":"2024-01-06 10:00:00","isDeposit":false,"blockNumber":120,"tokenX":{"amount":"2.0","price":"25.0"},"tokenY":{"amount":"50","price":"1.0"}}""")
    w.println("""{"user_address":"U2","poolAddress":"P1","timestamp":"2024-01-07 10:00:00","isDeposit":true,"blockNumber":130,"tokenX":{"amount":"0.5","price":"25.0"},"tokenY":{"amount":"25","price":"1.0"}}""")
    w.close()
    f.getPath
  }

  private def load() = spark.read
    .format("graft.sources.FixtureJsonSource")
    .option("payload", "userHistory")
    .load(dir)

  describe("FixtureJsonSource (DataSource V2)") {
    it("reads reference-shaped JSONL with the payload schema") {
      val df = load()
      assert(df.count() == 3)
      assert(df.schema("tokenX").dataType.typeName == "struct")
      val amounts = df.select($"tokenX.amount").as[String].collect().toSet
      assert(amounts == Set("1.5", "2.0", "0.5"))
    }

    it("pushes comparison filters into the scan (evaluated pre-materialization)") {
      val df = load().filter($"blockNumber" > 100 && $"isDeposit" === true)
      assert(df.select($"user_address").as[String].collect().toSeq == Seq("U2"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThan(blockNumber,100)"),
        s"pushed filter missing from scan description:\n$plan")
    }

    it("prunes columns down to the projected set") {
      val df = load().select($"user_address")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema=struct<user_address:string>"),
        s"column pruning missing:\n$plan")
    }

    it("quarantines poisoned rows in PERMISSIVE mode instead of failing the sweep") {
      val d = Files.createTempDirectory("fixture-poison").toFile
      val f = new java.io.File(d, "history.jsonl")
      val w = new java.io.PrintWriter(f, "UTF-8")
      w.println("""{"user_address":"U1","poolAddress":"P1","timestamp":"2024-01-05 10:00:00","isDeposit":true,"blockNumber":100,"tokenX":{"amount":"1.5","price":"24.0"},"tokenY":{"amount":"100","price":"1.0"}}""")
      w.println("""{"user_address":"U2","poolAddress"!!GARBAGE!!""") // poisoned
      w.println("""{"user_address":"U3","poolAddress":"P1","timestamp":"2024-01-07 10:00:00","isDeposit":true,"blockNumber":130,"tokenX":{"amount":"0.5","price":"25.0"},"tokenY":{"amount":"25","price":"1.0"}}""")
      w.close()

      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val schema = StructType(
        graft.sources.FixtureJsonSource.payloadSchema("userHistory").fields :+
          StructField("_corrupt_record", StringType))

      // FAILFAST (default): the poisoned line kills the read
      intercept[Exception] {
        spark.read.format("graft.sources.FixtureJsonSource")
          .schema(schema).load(f.getPath).count()
      }

      // PERMISSIVE: N-1 good rows + 1 quarantined row with the raw line
      val p = spark.read.format("graft.sources.FixtureJsonSource")
        .schema(schema).option("mode", "PERMISSIVE").load(f.getPath)
      assert(p.count() == 3)
      val good = p.filter($"_corrupt_record".isNull)
      assert(good.select($"user_address").as[String].collect().toSet == Set("U1", "U3"))
      val bad = p.filter($"_corrupt_record".isNotNull)
        .select($"_corrupt_record").as[String].collect()
      assert(bad.toSeq == Seq("""{"user_address":"U2","poolAddress"!!GARBAGE!!"""))

      // DROPMALFORMED: poisoned line silently skipped
      val dropped = spark.read.format("graft.sources.FixtureJsonSource")
        .schema(schema).option("mode", "DROPMALFORMED").load(f.getPath)
      assert(dropped.count() == 2)
    }

    it("feeds the snapshot pipeline end-to-end") {
      // the connector's frames are drop-in history inputs
      val hist = load()
      import graft.ops.Relational
      import org.apache.spark.sql.functions._
      val latest = Relational.latestByKey(
        hist.filter($"isDeposit" === true),
        Seq(col("user_address")), Seq(col("blockNumber")))
      assert(latest.count() == 2) // U1's block-100 deposit + U2's block-130
    }
  }
}
