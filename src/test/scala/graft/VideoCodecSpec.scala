package graft

import graft.functions.VideoCodec
import org.apache.spark.sql.functions._

/** Byte-level video plane: MP4 encode→box-walk round trips, untrusted
  * size-field robustness, and the per-frame checksum against the
  * documented generator — including the wrong-offset sensitivity the
  * oracle relies on. */
class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  describe("ISO BMFF round trip") {
    it("recovers timescale/duration/dimensions/frame-count from the box walk") {
      for ((n, w, h, seed) <- Seq((1, 1, 1, 0L), (64, 640, 480, 7L),
                                  (17, 1920, 1080, 123L), (4096, 65535, 65535, 5L))) {
        val mp4 = VideoCodec.renderMp4(n, w, h, seed)
        assert(new String(mp4.slice(4, 8)) == "ftyp")
        assert(VideoCodec.mp4Timescale(mp4) == 90000)
        assert(VideoCodec.mp4Duration(mp4) == n * 3000)
        assert(VideoCodec.mp4Width(mp4) == w)
        assert(VideoCodec.mp4Height(mp4) == h)
        assert(VideoCodec.mp4Frames(mp4) == n)
      }
    }

    it("declared box sizes tile the file exactly (writer self-consistency)") {
      val mp4 = VideoCodec.renderMp4(5, 320, 240, 3L)
      // top level must be exactly ftyp + moov + mdat, sizes summing to EOF
      var o = 0
      val tops = Seq.newBuilder[String]
      while (o < mp4.length) {
        val size = ((mp4(o) & 0xff) << 24) | ((mp4(o + 1) & 0xff) << 16) |
          ((mp4(o + 2) & 0xff) << 8) | (mp4(o + 3) & 0xff)
        tops += new String(mp4, o + 4, 4, "US-ASCII")
        assert(size >= 8 && o + size <= mp4.length)
        o += size
      }
      assert(o == mp4.length)
      assert(tops.result() == Seq("ftyp", "moov", "mdat"))
    }

    it("rejects non-MP4 payloads with -1 metadata") {
      assert(VideoCodec.mp4Frames("not a video at all".getBytes) == -1)
      assert(VideoCodec.mp4Width(Array.emptyByteArray) == -1)
    }

    it("bails to -1 on corrupt box sizes instead of looping or over-reading") {
      val good = VideoCodec.renderMp4(8, 64, 48, 2L)
      def withSize(at: Int, v: Int): Array[Byte] = {
        val b = good.clone()
        b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
        b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
        b
      }
      val moovOff = 24 // ftyp is 24 bytes
      assert(VideoCodec.mp4Frames(withSize(moovOff, -8)) == -1)   // negative size
      assert(VideoCodec.mp4Frames(withSize(moovOff, 4)) == -1)    // size < 8 (stationary cursor)
      assert(VideoCodec.mp4Frames(withSize(moovOff, 1 << 30)) == -1) // past EOF
      assert(VideoCodec.mp4Frames(withSize(moovOff, 1)) == -1)    // 64-bit largesize: out of scope
      assert(VideoCodec.mp4Frames(good.take(100)) == -1)          // truncated container
      assert(VideoCodec.mp4FrameChecksum(withSize(moovOff, -8), 0) == -1L)
    }
  }

  describe("frame checksum through the sample tables") {
    it("matches the generator reference for every frame") {
      for (seed <- Seq(0L, 2L, 41L); n <- Seq(1, 9, 64)) {
        val mp4 = VideoCodec.renderMp4(n, 320, 240, seed)
        (0 until n).foreach { f =>
          assert(VideoCodec.mp4FrameChecksum(mp4, f) ==
                 VideoCodec.frameChecksumRef(seed, f), s"seed=$seed n=$n f=$f")
        }
      }
    }

    it("is offset-sensitive: consecutive equal-size frames still differ") {
      // seed chosen so some adjacent frames share a size; their payload
      // bytes differ, so a checksum that mislocated the frame would
      // collide with its neighbor's — assert they don't
      val mp4 = VideoCodec.renderMp4(64, 64, 48, 11L)
      val sums = (0 until 64).map(VideoCodec.mp4FrameChecksum(mp4, _))
      assert(sums.distinct.size == 64)
    }

    it("returns -1 out of range") {
      val mp4 = VideoCodec.renderMp4(4, 64, 48, 1L)
      assert(VideoCodec.mp4FrameChecksum(mp4, -1) == -1L)
      assert(VideoCodec.mp4FrameChecksum(mp4, 4) == -1L)
    }
  }

  describe("column API") {
    it("parses metadata and frame checksums distributed, matching the JVM reference") {
      val df = Seq((10L, 5), (11L, 12), (14L, 1)).toDF("seed", "n")
        .select($"seed", $"n",
          VideoCodec.mp4Video($"n", lit(320), lit(240), $"seed").as("payload"))
      val got = df.select($"seed", $"n",
          VideoCodec.videoFrames($"payload").as("nf"),
          VideoCodec.videoDuration($"payload").as("dur"),
          VideoCodec.videoFrameChecksum($"payload", lit(0)).as("c0"))
        .as[(Long, Int, Int, Int, Long)].collect()
      got.foreach { case (seed, n, nf, dur, c0) =>
        assert(nf == n && dur == n * 3000)
        assert(c0 == VideoCodec.frameChecksumRef(seed, 0))
      }
    }
  }
}
