package graft

import graft.ext.{Sampling, ShardedPrefix}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property proof for the sharded prefix-sum twins (q61b/q68b): on
  * arbitrary corpora — skewed groups, sparse ids, duplicate qualities —
  * the two-pass sharded plans produce EXACTLY the rows of their
  * single-window counterparts, for any shard width / bucket count.
  */
class ShardedPrefixSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSamples[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val vocab = Vector("the", "cat", "sat", "on", "mat", "Zürich",
    "data", "pipeline", "token", "a", "of", "quality!", "123")

  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 5000L)
      lang <- Gen.oneOf("en", "de", "fr")
      nw <- Gen.choose(0, 25)
      ws <- Gen.listOfN(nw, Gen.oneOf(vocab))
    } yield (id, lang, ws.mkString(" ")))
  } yield rows.groupBy(_._1).map(_._2.head).toList // distinct ids

  describe("packedOffsets (q61b) ≡ single-window running offsets (q61)") {
    it("row-identical for arbitrary corpora and shard widths") {
      forAllSamples(Gen.zip(corpusGen, Gen.choose(1L, 64L))) { case (rows, width) =>
        val docs = rows.toDF("doc_id", "lang", "text")
          .select($"doc_id", $"lang",
            graft.functions.TextFunctions.tokenCount($"text").as("n_tokens"))
        val w = Window.partitionBy($"lang").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val expected = docs
          .withColumn("start_off", sum($"n_tokens").over(w) - $"n_tokens")
          .select($"lang".as("grp"), $"doc_id", $"n_tokens", $"start_off")
        val actual = ShardedPrefix.packedOffsets(docs, "lang", "doc_id",
          "n_tokens", width)
        assert(actual.exceptAll(expected).isEmpty &&
               expected.exceptAll(actual).isEmpty,
          s"mismatch at width=$width")
      }
    }
  }

  describe("tokenBudgetSelectSharded (q68b) ≡ greedy window select (q68)") {
    it("same selected set and cumulative sums for arbitrary corpora") {
      forAllSamples(Gen.zip(corpusGen, Gen.choose(1, 12), Gen.choose(10L, 300L))) {
        case (rows, nBuckets, budget) =>
          val docs = rows.toDF("doc_id", "lang", "text")
          val expected = Sampling.tokenBudgetSelect(docs, "lang", "text",
            "doc_id", budget)
          val actual = ShardedPrefix.tokenBudgetSelectSharded(docs, "lang",
            "text", "doc_id", budget, nBuckets)
          assert(actual.exceptAll(expected).isEmpty &&
                 expected.exceptAll(actual).isEmpty,
            s"mismatch at nBuckets=$nBuckets budget=$budget")
      }
    }
  }
}
