package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world", "en", "src0", 11L),
    (1L, "abc", "en", "src1", 3L),
    (2L, "", "de", "src0", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  describe("mediaFromDocuments") {
    it("builds binary payloads with typed metadata") {
      val m = Multimodal.mediaFromDocuments(docs)
      assert(m.schema("payload").dataType.typeName == "binary")
      val r = m.filter($"media_id" === 0).head()
      assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("sample_rate") == 16000)
      val mods = m.select($"modality").as[String].collect().toSet
      assert(mods.subsetOf(Set("image", "audio", "video")))
    }
  }

  describe("extractFeatures (partition-batched decode stub)") {
    it("emits deterministic byte statistics per payload") {
      val f = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      val r = f.filter($"media_id" === 1).head() // "abc" = bytes 97,98,99
      assert(r.getAs[Long]("n_bytes") == 3)
      assert(r.getAs[Double]("byte_mean") == 98.0)
      val hist = r.getAs[scala.collection.Seq[Long]]("histogram")
      assert(hist.sum == 3)
      assert(hist(97 % 16) >= 1)
      // empty payload handled, not crashed
      val empty = f.filter($"media_id" === 2).head()
      assert(empty.getAs[Long]("n_bytes") == 0 && empty.getAs[Double]("byte_mean") == 0.0)
    }
  }

  describe("sampleFrames") {
    it("partitions the payload into stride-sampled frame chunks") {
      val frames = Multimodal.sampleFrames(Multimodal.mediaFromDocuments(docs), stride = 2)
      val f0 = frames.filter($"media_id" === 0).orderBy($"frame_idx").collect()
      assert(f0.nonEmpty)
      assert(f0.map(_.getAs[Int]("frame_idx")).forall(_ % 2 == 0))
      assert(f0.forall(_.getAs[Array[Byte]]("frame").nonEmpty))
    }
  }
}
