package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for training-data pipelines: media as
  * opaque `binary` payloads + typed metadata, with decode / feature
  * extraction / frame sampling as partition-batched transforms.
  *
  * The actual codecs (JPEG/PNG/audio) are NOT in this container, so the
  * decode kernel is STUBBED with a deterministic fake (byte histogram +
  * moments). Everything around the stub — schema, encoders, partition
  * batching, output shape — is real and tested; swapping `decodeStub`
  * for a JNI/codec call is a one-function change.
  *
  * Scale design: feature extraction runs as `mapPartitions` so codec
  * state (decoder instances, model weights) initializes once per
  * partition, not per row — the Scala analogue of `mapInPandas` batch
  * processing. Payload bytes never shuffle: extraction is a narrow map,
  * and downstream aggregations carry only the small feature vectors.
  */
object Multimodal {

  val HistBins = 16

  /** media table schema: (id, modality, payload, meta{width,height,
    * sample_rate, n_frames}). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("byte_mean", DoubleType),
    StructField("histogram", ArrayType(LongType))))

  /** Derives a media table from the documents fixture: payload = UTF-8
    * bytes of the text (the deterministic stand-in for real media
    * bytes), metadata synthesized from stable per-doc values. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // round-robin modality assignment, deterministic in doc_id
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 64 + 1).cast("int").as("n_frames")).as("meta"))

  /** >>> CODEC BOUNDARY (STUB) <<<
    * A production build decodes the payload here (image pixels / audio
    * samples). Offline stand-in: deterministic byte statistics. */
  private def decodeStub(payload: Array[Byte]): (Long, Double, Array[Long]) = {
    val hist = new Array[Long](HistBins)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b % HistBins) += 1
      sum += b
      i += 1
    }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    (payload.length.toLong, mean, hist)
  }

  /** Partition-batched feature extraction: one decoder "context" per
    * partition, rows processed in a tight loop. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("modality"), col("payload"))
      .mapPartitions { rows =>
        // per-partition init happens here (decoder instance, buffers)
        rows.map { r =>
          val (n, mean, hist) = decodeStub(r.getAs[Array[Byte]]("payload"))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
              n, mean, hist.toSeq)
        }
      }(enc)
  }

  /** Frame sampling stub: split the payload into `meta.n_frames` chunks
    * and emit every `stride`-th chunk as a (media_id, frame_idx, frame)
    * row — the shuffle-free explode pattern real video sampling uses. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"), col("meta.n_frames").as("n_frames"))
      .flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val n = math.max(r.getAs[Int]("n_frames"), 1)
        val frameLen = math.max(payload.length / n, 1)
        (0 until n by stride).iterator.map { f =>
          val from = math.min(f * frameLen, payload.length)
          val until = math.min(from + frameLen, payload.length)
          Row(r.getAs[Long]("media_id"), f, java.util.Arrays.copyOfRange(payload, from, until))
        }
      }(enc)
  }

  /** Budget-uniform frame-sampling PLAN over video metadata — the
    * deterministic scheduling half of frame extraction (what a real
    * pipeline computes BEFORE touching any pixels, and all it ever
    * shuffles): per video, sample min(n_frames, budget) frames at
    * uniform stride, frame_idx = floor(i * n_frames / m). Pure
    * Catalyst (sequence + explode, in-row, map-only at any corpus
    * size); [[sampleFrames]] is the payload-chunking consumer of this
    * schedule. The index arithmetic is EXACT in double (m = budget is
    * the power-of-two 8 when n >= budget, and i*n/n = i when n <
    * budget), so the plan is oracle-checkable bit-for-bit. */
  def frameSamplePlan(media: DataFrame, budget: Int): DataFrame = {
    val m = least(col("n_frames"), lit(budget))
    media.filter(col("modality") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"))
      .withColumn("m", m)
      .select(col("media_id"), col("n_frames"),
              explode(sequence(lit(0), col("m") - 1)).as("sample_i"), col("m"))
      .select(col("media_id"), col("n_frames"), col("sample_i"),
              floor((col("sample_i") * col("n_frames")).cast("double") / col("m"))
                .cast("long").as("frame_idx"))
  }

  /** Oracle-checkable metadata lineage over the binary column (the
    * deterministic, non-stub part): byte length, sha256, per-source
    * first-byte bucket histogram. */
  def payloadStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      sha2(col("text").cast("binary"), 256).as("sha256"),
      (ascii(substring(col("text"), 1, 1)) % HistBins).cast("int").as("first_byte_bucket"))
}
