package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level audio support — the audio sibling of [[ImageCodec]]
  * (VERDICT r10 #3's multimodal plane, extended to the second modality):
  * a real RIFF/WAVE writer/parser for 16-bit PCM, and an integer-exact
  * band-energy fingerprint over the decoded samples, so the DuckDB
  * oracle can re-derive everything analytically from the documented
  * sample formula (the q50/q225 split: the engine runs the real byte
  * pipeline, the oracle recomputes through an independent derivation).
  *
  * Written from the public RIFF/WAVE layout (RIFF chunk + 'WAVE' form,
  * 'fmt ' subchunk carrying format/channels/sample-rate/bits, 'data'
  * subchunk with little-endian PCM). The parser walks subchunks, so
  * extra chunks (LIST/INFO) are skipped like a real reader must.
  *
  * The fingerprint is deliberately transform-free (no FFT — and none is
  * needed for the structural layer this tests): the sample stream is cut
  * into 16 equal frames, each frame's MEAN ABSOLUTE amplitude (integer
  * division) forms a 16-value envelope, and bit i of the fingerprint is
  * set iff envelope[i] > envelope[i-1] (the difference coding used by
  * audio thumbprints), 15 bits + bit 15 comparing last-to-first. Pure
  * integer arithmetic end to end — SQL-portable exactly.
  */
object AudioCodec {

  /** Deterministic 16-bit PCM test signal — the shared contract with the
    * SQL oracle: s(t) = ((seed*37 + t*(3 + seed mod 7)) mod 4001) - 2000
    * + (t mod 17) * 13, a sawtooth-ish integer stream in [-2000, 2216).
    * Seed-dependent slope so different seeds decorrelate. */
  def sample(t: Int, seed: Long): Int =
    (((seed * 37L + t.toLong * (3L + seed % 7L)) % 4001L).toInt - 2000) +
      (t % 17) * 13

  /** A REAL RIFF/WAVE file: PCM 16-bit mono, little-endian, with an
    * extra LIST/INFO chunk before 'data' so parsers must walk. */
  def renderWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0 && nSamples <= (1 << 20), s"nSamples out of range: $nSamples")
    require(sampleRate > 0 && sampleRate <= 384000, s"sampleRate out of range: $sampleRate")
    val dataLen = nSamples * 2
    val info = "graft".getBytes("US-ASCII") ++ Array[Byte](0) // odd->padded
    val listLen = 4 + 8 + info.length // 'INFO' + 'ICMT' header + payload
    val out = java.nio.ByteBuffer.allocate(12 + 24 + 8 + listLen + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(4 + 24 + 8 + listLen + 8 + dataLen)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")); out.putInt(16)
    out.putShort(1) // PCM
    out.putShort(1) // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate * 2) // byte rate
    out.putShort(2) // block align
    out.putShort(16) // bits per sample
    out.put("LIST".getBytes("US-ASCII")); out.putInt(listLen)
    out.put("INFO".getBytes("US-ASCII"))
    // RIFF convention: declared size is the PAYLOAD length (5 for "graft");
    // the pad byte that word-aligns the chunk is NOT counted — readers
    // round up via (len & 1) when advancing, as parseMeta does below.
    out.put("ICMT".getBytes("US-ASCII")); out.putInt(info.length - 1)
    out.put(info)
    out.put("data".getBytes("US-ASCII")); out.putInt(dataLen)
    var t = 0
    while (t < nSamples) { out.putShort(sample(t, seed).toShort); t += 1 }
    out.array()
  }

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

  /** (sampleRate, channels, bitsPerSample, nSamples); all -1 when the
    * payload is not RIFF/WAVE. Walks subchunks (word-aligned lengths).
    *
    * Length fields come from an UNTRUSTED payload (this is the catalog
    * pass over arbitrary corpora): a negative len would make the cursor
    * stationary (infinite loop inside a codegen'd expression — a silent
    * task hang), and an oversized len would read past the array. Every
    * chunk is therefore validated — `len >= 0` and fully in-bounds —
    * and a malformed chunk bails to the unknown (-1) metadata path
    * instead of trusting the bytes. */
  private def parseMeta(b: Array[Byte]): (Int, Int, Int, Int) = {
    if (!isWav(b)) return (-1, -1, -1, -1)
    var rate = -1; var ch = -1; var bits = -1; var n = -1
    var o = 12
    while (o + 8 <= b.length) {
      val t = tag(b, o); val len = leInt(b, o + 4)
      if (len < 0 || o + 8 + len > b.length) return (-1, -1, -1, -1)
      if (t == "fmt ") {
        // reads up to o+24: require the fmt subchunk to actually hold
        // the 16-byte PCM header before touching it
        if (len < 16) return (-1, -1, -1, -1)
        ch = leShort(b, o + 10); rate = leInt(b, o + 12); bits = leShort(b, o + 22)
      } else if (t == "data" && bits > 0 && ch > 0) {
        n = len / (bits / 8) / ch
      }
      o += 8 + len + (len & 1) // chunks are word-aligned
    }
    (rate, ch, bits, n)
  }

  def wavSampleRate(b: Array[Byte]): Int = parseMeta(b)._1
  def wavChannels(b: Array[Byte]): Int = parseMeta(b)._2
  def wavBits(b: Array[Byte]): Int = parseMeta(b)._3
  def wavSamples(b: Array[Byte]): Int = parseMeta(b)._4

  /** Decodes mono 16-bit PCM from the data chunk. Malformed payloads
    * (not RIFF/WAVE, corrupt chunk length, no data chunk) return an
    * EMPTY array — the same graceful unknown path as [[parseMeta]]'s
    * -1 tuple, because both are reachable from catalog passes over
    * untrusted corpora (q230) where one corrupt record must not abort
    * the whole task (ADVICE r12: the require here and the bail in
    * parseMeta were inconsistent failure modes for the same contract).
    * Generator-side self-checks that need loud failure assert on the
    * SENTINEL (AudioCodecSpec), not on an exception. */
  def decodePcm(b: Array[Byte]): Array[Int] = {
    if (!isWav(b)) return Array.emptyIntArray
    var o = 12
    var dataOff = -1; var dataLen = 0
    while (o + 8 <= b.length) {
      val t = tag(b, o); val len = leInt(b, o + 4)
      if (len < 0 || o + 8 + len > b.length) return Array.emptyIntArray
      if (t == "data") { dataOff = o + 8; dataLen = len }
      o += 8 + len + (len & 1)
    }
    if (dataOff < 0) return Array.emptyIntArray
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = leShort(b, dataOff + 2 * i).toShort.toInt // sign-extend
      i += 1
    }
    out
  }

  /** 16-bit envelope-difference fingerprint over the decoded PCM: sample
    * t lands in frame (t*16)/n (integer division — the binning a SQL
    * GROUP BY can invert exactly), per-frame mean |amplitude| by integer
    * division, bit i set iff env[i] > env[(i+15) mod 16] — the
    * difference coding audio thumbprints use (bit 0 wraps to frame 15).
    * Returned as a long in [0, 65536). Needs n >= 16 so every frame is
    * non-empty (a SQL GROUP BY emits no row for an empty frame while
    * this would return 0); shorter or malformed payloads (decodePcm's
    * empty-array bail included) return the -1 sentinel — outside the
    * [0, 65536) range of every real fingerprint, same graceful contract
    * as the metadata parsers. */
  def envelopeFingerprint(b: Array[Byte]): Long = {
    val s = decodePcm(b)
    if (s.length < 16) return -1L
    val acc = new Array[Long](16)
    val cnt = new Array[Long](16)
    var t = 0
    while (t < s.length) {
      // long arithmetic: t*16 wraps Int past ~2^27 samples (externally
      // supplied WAVs can be that large even though renderWav caps at 1M);
      // this also matches the documented SQL derivation at any n
      val f = (t.toLong * 16 / s.length).toInt
      acc(f) += math.abs(s(t)); cnt(f) += 1
      t += 1
    }
    val env = Array.tabulate(16)(f => acc(f) / cnt(f))
    var bits = 0L
    var i = 0
    while (i < 16) {
      val prev = env((i + 15) % 16)
      if (env(i) > prev) bits |= (1L << i)
      i += 1
    }
    bits
  }

  // ---------------------------------------------------------- column API

  private def invoke(method: String, ret: DataType, args: (Column, DataType)*): Column =
    GraftColumnBridge.column(StaticInvoke(
      AudioCodec.getClass, ret, method,
      args.map { case (c, t) => GraftColumnBridge.expression(c.cast(t)) },
      propagateNull = true, returnNullable = false))

  def wavAudio(nSamples: Column, sampleRate: Column, seed: Column): Column =
    invoke("renderWav", BinaryType, (nSamples, IntegerType),
      (sampleRate, IntegerType), (seed, LongType))

  def audioSampleRate(payload: Column): Column =
    invoke("wavSampleRate", IntegerType, (payload, BinaryType))

  def audioChannels(payload: Column): Column =
    invoke("wavChannels", IntegerType, (payload, BinaryType))

  def audioBits(payload: Column): Column =
    invoke("wavBits", IntegerType, (payload, BinaryType))

  def audioSamples(payload: Column): Column =
    invoke("wavSamples", IntegerType, (payload, BinaryType))

  def audioFingerprint(payload: Column): Column =
    invoke("envelopeFingerprint", LongType, (payload, BinaryType))
}
