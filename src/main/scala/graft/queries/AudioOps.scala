package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.AudioCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Audio-plane operators — the second multimodal modality beside
  * [[ImageOps]] (VERDICT r10 #3 extended): real RIFF/WAVE bytes
  * rendered, parsed and fingerprinted inside the engine, with the
  * DuckDB oracle re-deriving every value analytically from the
  * documented PCM formula. Same corpus convention as the image plane:
  * payloads derive deterministically from `documents` so the oracle can
  * rebuild them from relational inputs. */
object AudioOps {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def nSamp = (lit(512) + (col("n_chars") * 7) % 3000).cast("int")
  private def rateOf = element_at(
    array(lit(8000), lit(16000), lit(44100), lit(48000)),
    (col("doc_id") % 4 + 1).cast("int"))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q229_audio_meta",
      "audio metadata extraction from REAL payload bytes - the RIFF/WAVE sibling of q225's PNG/JPEG parse: every doc carries a complete PCM-16 mono WAV (RIFF header, fmt subchunk, an extra LIST/INFO subchunk the parser must skip over word-aligned lengths, little-endian data chunk), and the query reads sample-rate / channels / bit-depth / sample-count back OUT of the bytes by walking the subchunk stream. The oracle recomputes the expected values analytically from the generator formulas (n = 512 + 7*n_chars mod 3000; rate cycles {8000,16000,44100,48000} by doc_id) - a hash match proves writer and parser agree on the real byte layout (the q50/q225 split). Per-row codegen StaticInvoke narrow map; payloads never shuffle - the catalog pass a 100 TB audio corpus runs before any sample decode",
      (s, d) => {
        val payload = AudioCodec.wavAudio(nSamp, rateOf, col("doc_id"))
        t(s, d, "documents")
          .select(col("doc_id"), payload.as("payload"))
          .select(col("doc_id"),
            AudioCodec.audioSampleRate(col("payload")).as("sample_rate"),
            AudioCodec.audioChannels(col("payload")).as("channels"),
            AudioCodec.audioBits(col("payload")).as("bits"),
            AudioCodec.audioSamples(col("payload")).as("n_samples"))
      },
      Some("""SELECT doc_id, CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 44100 ELSE 48000 END AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS channels, CAST(16 AS INTEGER) AS bits, CAST(512 + (n_chars * 7) % 3000 AS INTEGER) AS n_samples FROM documents""")),

    QueryDef("q230_audio_fingerprint",
      "audio envelope fingerprint over REAL decoded PCM - the audio q226: for every 4th doc's WAV, the 16-bit envelope-difference fingerprint (16 equal frames by the SQL-invertible (t*16)/n integer binning, per-frame mean |amplitude| by integer division, bit i set iff env[i] > env[(i+15) mod 16] - the difference coding audio thumbprints use) computed by DECODING the data chunk inside the engine (subchunk walk, sign-extended little-endian PCM-16). The oracle never sees bytes: it rebuilds the fingerprint from the documented sawtooth sample formula via a generate_series grid in integer-only arithmetic, so a hash match proves the render -> RIFF-encode -> walk -> decode -> fingerprint loop bit-faithful. Scale shape: decode+hash is a narrow per-row map; downstream similarity ships 2-byte fingerprints (Dedup.hammingPairsBanded consumes 64-bit planes; the 16-bit envelope class is the bucket key tier)",
      (s, d) => {
        val au = t(s, d, "documents")
          .filter(col("doc_id") % 4 === 0)
          .select(col("doc_id"),
            AudioCodec.wavAudio(nSamp, rateOf, col("doc_id")).as("payload"),
            nSamp.cast("long").as("n_samples"))
        au.select(col("doc_id"), col("n_samples"),
          AudioCodec.audioFingerprint(col("payload")).as("fingerprint"))
      },
      Some("""WITH au AS (SELECT doc_id, doc_id AS seed, CAST(512 + (n_chars * 7) % 3000 AS BIGINT) AS n FROM documents WHERE doc_id % 4 = 0), tt AS (SELECT doc_id, n, seed, unnest(generate_series(0, n - 1)) AS t FROM au), sv AS (SELECT doc_id, n, t, ((seed * 37 + t * (3 + seed % 7)) % 4001) - 2000 + (t % 17) * 13 AS s FROM tt), fr AS (SELECT doc_id, (t * 16) // n AS f, SUM(abs(s)) // COUNT(*) AS env FROM sv GROUP BY 1, 2), bt AS (SELECT a.doc_id, a.f, CASE WHEN a.env > b.env THEN 1 ELSE 0 END AS bit FROM fr a JOIN fr b ON a.doc_id = b.doc_id AND b.f = (a.f + 15) % 16), fp AS (SELECT doc_id, CAST(SUM(bit * (1 << CAST(f AS INT))) AS BIGINT) AS fingerprint FROM bt GROUP BY 1) SELECT au.doc_id, au.n AS n_samples, fp.fingerprint FROM au JOIN fp ON au.doc_id = fp.doc_id""")))
}
