package graft

import graft.ext.Sampling

/** Epoch-upsampling semantics: integral epochs replicate exactly,
  * fractional epochs are hash-Bernoulli (bounded, deterministic), and
  * the cap limits runaway small-stratum blow-up. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(counts: (String, Int)*) = {
    var id = -1L
    counts.flatMap { case (g, n) => (0 until n).map { _ => id += 1; (id, g) } }
      .toDF("doc_id", "lang")
  }

  describe("deterministic epoch upsampling") {
    it("integral epoch ratios replicate exactly: maxN/n copies per doc") {
      // en=4 (max), de=2 -> 2.0 epochs, fr=1 -> 4.0 epochs: all integral,
      // so replication is exact with no hash dependence
      val out = Sampling.epochUpsample(docs("en" -> 4, "de" -> 2, "fr" -> 1),
                                       "lang", "doc_id")
        .select($"lang", $"doc_id", $"n_copies", $"copy_no")
        .as[(String, Long, Long, Long)].collect()
      val byLang = out.groupBy(_._1)
      assert(byLang("en").map(_._3).forall(_ == 1L))
      assert(byLang("de").map(_._3).forall(_ == 2L))
      assert(byLang("fr").map(_._3).forall(_ == 4L))
      // copy_no enumerates 1..k per doc
      out.groupBy(r => (r._1, r._2)).foreach { case ((_, _), rows) =>
        assert(rows.map(_._4).sorted.toSeq == (1L to rows.head._3).toSeq)
      }
    }
    it("fractional epochs stay within floor..ceil and are reproducible") {
      // en=3 (max), de=2 -> ep = 1.5: each de doc gets 1 or 2 copies
      val d = docs("en" -> 3, "de" -> 2)
      val run1 = Sampling.epochUpsample(d, "lang", "doc_id")
        .select($"doc_id", $"n_copies").as[(Long, Long)].collect().toMap
      val run2 = Sampling.epochUpsample(d, "lang", "doc_id")
        .select($"doc_id", $"n_copies").as[(Long, Long)].collect().toMap
      assert(run1 == run2, "hash-Bernoulli must be a pure function of the data")
      d.filter($"lang" === "de").select($"doc_id").as[Long].collect()
        .foreach(id => assert(run1(id) == 1L || run1(id) == 2L))
    }
    it("maxEpochs caps small-stratum blow-up") {
      val out = Sampling.epochUpsample(docs("en" -> 10, "xx" -> 1),
                                       "lang", "doc_id", maxEpochs = 4.0)
        .filter($"lang" === "xx").select($"n_copies").as[Long].collect()
      assert(out.forall(_ == 4L), "10/1 epochs capped at 4")
    }
  }
}
