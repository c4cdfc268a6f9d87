package graft

import graft.functions.AudioCodec
import org.apache.spark.sql.functions._

/** Byte-level audio plane: WAV encode→parse→decode round trips, the
  * subchunk walk (LIST/INFO skipped, word alignment honored), and the
  * envelope fingerprint against a direct re-derivation. */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  describe("RIFF/WAVE round trip") {
    it("recovers rate/channels/bits/sample-count and the exact PCM") {
      for ((n, rate, seed) <- Seq((512, 8000, 0L), (3000, 44100, 9L), (517, 48000, 123L))) {
        val wav = AudioCodec.renderWav(n, rate, seed)
        assert(new String(wav.slice(0, 4)) == "RIFF" && new String(wav.slice(8, 12)) == "WAVE")
        assert(AudioCodec.wavSampleRate(wav) == rate)
        assert(AudioCodec.wavChannels(wav) == 1)
        assert(AudioCodec.wavBits(wav) == 16)
        assert(AudioCodec.wavSamples(wav) == n)
        val pcm = AudioCodec.decodePcm(wav)
        assert(pcm.length == n)
        assert(pcm.toSeq == (0 until n).map(t => AudioCodec.sample(t, seed)))
      }
    }
    it("rejects non-WAV payloads with -1 metadata") {
      assert(AudioCodec.wavSampleRate("nope".getBytes) == -1)
    }
    it("declares the ICMT size as the unpadded payload length (RIFF convention)") {
      // the pad byte that word-aligns the odd-length comment is written
      // but NOT counted in the declared size — external readers would
      // otherwise treat the trailing NUL as comment content
      val wav = AudioCodec.renderWav(64, 8000, 7L)
      val icmt = wav.indexOfSlice("ICMT".getBytes("US-ASCII"))
      assert(icmt > 0)
      val declared = (wav(icmt + 4) & 0xff) | ((wav(icmt + 5) & 0xff) << 8)
      assert(declared == 5, s"ICMT declared size $declared, want payload length 5")
      assert(new String(wav, icmt + 8, 5, "US-ASCII") == "graft")
      assert(wav(icmt + 13) == 0) // pad byte present, outside the declared size
      assert(AudioCodec.wavSamples(wav) == 64) // walker still lands on 'data'
    }
    it("bails to -1 metadata on corrupt chunk lengths instead of hanging") {
      // untrusted payloads: a negative declared length would otherwise
      // leave the subchunk cursor stationary (infinite loop in a
      // codegen'd per-row expression) and an oversized one would read
      // past the array — both must hit the unknown path, loudly or -1
      val good = AudioCodec.renderWav(64, 8000, 1L)
      def withLen(at: Int, len: Int): Array[Byte] = {
        val b = good.clone()
        b(at) = (len & 0xff).toByte; b(at + 1) = ((len >> 8) & 0xff).toByte
        b(at + 2) = ((len >> 16) & 0xff).toByte; b(at + 3) = ((len >> 24) & 0xff).toByte
        b
      }
      val fmtLenOff = 16 // 'fmt ' tag at 12, its length field at 16
      assert(AudioCodec.wavSampleRate(withLen(fmtLenOff, -8)) == -1)
      assert(AudioCodec.wavSampleRate(withLen(fmtLenOff, 1 << 30)) == -1)
      assert(AudioCodec.wavSampleRate(withLen(fmtLenOff, 4)) == -1) // fmt too short for its own header
      // decodePcm shares the graceful unknown path (ADVICE r12): a
      // corrupt chunk record yields the empty-array sentinel, and the
      // fingerprint built on it yields -1 — one bad corpus record never
      // aborts the task
      assert(AudioCodec.decodePcm(withLen(fmtLenOff, -8)).isEmpty)
      assert(AudioCodec.decodePcm(withLen(fmtLenOff, 1 << 30)).isEmpty)
      assert(AudioCodec.envelopeFingerprint(withLen(fmtLenOff, -8)) == -1L)
      assert(AudioCodec.envelopeFingerprint(Array.fill[Byte](40)(0)) == -1L)
    }
  }

  describe("envelope fingerprint") {
    it("equals a direct re-derivation of the documented formula") {
      for (seed <- 0L until 20L) {
        val n = 512 + (seed * 131 % 3000).toInt
        val wav = AudioCodec.renderWav(n, 16000, seed)
        val acc = new Array[Long](16); val cnt = new Array[Long](16)
        for (t <- 0 until n) {
          val f = t * 16 / n
          acc(f) += math.abs(AudioCodec.sample(t, seed)); cnt(f) += 1
        }
        val env = Array.tabulate(16)(f => acc(f) / cnt(f))
        val want = (0 until 16).map(i =>
          if (env(i) > env((i + 15) % 16)) 1L << i else 0L).sum
        assert(AudioCodec.envelopeFingerprint(wav) == want, s"seed=$seed")
      }
    }
  }

  describe("column API") {
    it("q229's encode+parse chain is a narrow per-row map") {
      val df = Seq((0L, 100L), (3L, 999L)).toDF("doc_id", "n_chars")
        .select(col("doc_id"),
          AudioCodec.wavAudio(lit(600), lit(16000), col("doc_id")).as("p"))
        .select(col("doc_id"), AudioCodec.audioSamples(col("p")).as("n"),
          AudioCodec.audioFingerprint(col("p")).as("fp"))
      val rows = df.as[(Long, Int, Long)].collect().sortBy(_._1)
      assert(rows.map(_._2).toSeq == Seq(600, 600))
      assert(rows.head._3 ==
        AudioCodec.envelopeFingerprint(AudioCodec.renderWav(600, 16000, 0L)))
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }
}
