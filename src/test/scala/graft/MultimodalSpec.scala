package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with SharedSpark {

  test("decodeStub is deterministic and in range") {
    val payload = "some media bytes".getBytes("UTF-8")
    val (w1, h1, f1) = Multimodal.decodeStub(payload)
    val (w2, h2, f2) = Multimodal.decodeStub(payload)
    assert((w1, h1, f1) == (w2, h2, f2))
    assert(w1 >= 64 && w1 < 64 + 1857)
    assert(h1 >= 64 && h1 < 64 + 1017)
    assert(f1 >= 1 && f1 <= 16)
  }

  test("binaryFile source round-trips: file-backed meta == in-table meta") {
    import spark.implicits._
    val viaFiles = Multimodal.multimodalBinaryFiles(spark, sfDir)
      .as[Multimodal.MediaMeta].collect().sortBy(_.doc_id)
    val viaTable = Multimodal.multimodalMeta(spark, sfDir)
      .as[Multimodal.MediaMeta].collect().sortBy(_.doc_id)
    assert(viaFiles.length == viaTable.length)
    assert(viaFiles.toSeq == viaTable.toSeq)
  }

  test("multimodal_meta: byte_len matches payload size; sampling is ceil(n/2)") {
    import spark.implicits._
    val meta = Multimodal.multimodalMeta(spark, sfDir)
      .as[Multimodal.MediaMeta].collect()
    val lens = Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(meta.length == lens.size)
    meta.foreach { m =>
      assert(m.byte_len == lens(m.doc_id)) // ASCII text: chars == bytes
      assert(m.n_sampled == (m.n_frames + 1) / 2)
    }
  }

  test("decode parses hand-built BMP and farbfeld headers") {
    // BMP little-endian dims
    assert(Multimodal.decode(Multimodal.bmpBytes(800, 600)) ==
      (("bmp", 800L, 600L, 1L)))
    // top-down BMP: negative height means flipped row order, abs dims
    val topDown = Multimodal.bmpBytes(320, -240)
    assert(Multimodal.decode(topDown) == (("bmp", 320L, 240L, 1L)))
    // farbfeld big-endian dims
    assert(Multimodal.decode(Multimodal.farbfeldBytes(1920, 1080)) ==
      (("farbfeld", 1920L, 1080L, 1L)))
    // dims wide enough to exercise multi-byte encodings
    assert(Multimodal.decode(Multimodal.bmpBytes(65537, 70000)) ==
      (("bmp", 65537L, 70000L, 1L)))
    // an OS/2 BITMAPCOREHEADER (DIB size 12) stores u16 dims at other
    // offsets — the parser must refuse rather than fabricate dims
    val core = Multimodal.bmpBytes(100, 50)
    core(14) = 12
    assert(Multimodal.decode(core)._1 == "stub")
  }

  test("decode parses a hand-built PNG IHDR, big-endian dims") {
    assert(Multimodal.decode(Multimodal.pngBytes(1024, 768)) ==
      (("png", 1024L, 768L, 1L)))
    // multi-byte big-endian widths must not be flipped
    assert(Multimodal.decode(Multimodal.pngBytes(70000, 65537)) ==
      (("png", 70000L, 65537L, 1L)))
    // a PNG whose first chunk is not a 13-byte IHDR must refuse
    // rather than read garbage dims
    val wrongLen = Multimodal.pngBytes(64, 64)
    wrongLen(11) = 14
    assert(Multimodal.decode(wrongLen)._1 == "stub")
    val wrongType = Multimodal.pngBytes(64, 64)
    wrongType(12) = 'J'.toByte
    assert(Multimodal.decode(wrongType)._1 == "stub")
    // the 8-byte signature alone (truncated before IHDR) is not enough
    assert(Multimodal.decode(
      Multimodal.pngBytes(64, 64).take(16))._1 == "stub")
  }

  test("decode parses a hand-built GIF screen descriptor, little-endian dims") {
    assert(Multimodal.decode(Multimodal.gifBytes(640, 480)) ==
      (("gif", 640L, 480L, 1L)))
    // u16 edge values survive the signed-short round-trip
    assert(Multimodal.decode(Multimodal.gifBytes(65535, 1)) ==
      (("gif", 65535L, 1L, 1L)))
    // GIF87a variant accepted
    val g87 = Multimodal.gifBytes(320, 200)
    g87(4) = '7'.toByte
    assert(Multimodal.decode(g87) == (("gif", 320L, 200L, 1L)))
    // nonzero aspect-ratio byte → stub, never fabricated dims
    val aspect = Multimodal.gifBytes(320, 200)
    aspect(12) = 49.toByte
    assert(Multimodal.decode(aspect)._1 == "stub")
    // truncated header → stub
    assert(Multimodal.decode(Multimodal.gifBytes(320, 200).take(12))._1 == "stub")
  }

  test("audio decode parses WAV and AU headers exactly; guards fall to the stub") {
    // WAV: 44.1 kHz stereo 16-bit, 4410 samples → 100 ms exactly
    assert(Multimodal.decodeAudio(Multimodal.wavBytes(44100, 2, 16, 4410)) ==
      (("wav", 44100L, 2L, 4410L, 100L)))
    // AU: 8 kHz mono, 12000 samples → 1500 ms
    assert(Multimodal.decodeAudio(Multimodal.auBytes(8000, 1, 12000)) ==
      (("au", 8000L, 1L, 12000L, 1500L)))
    // duration truncates (integer division): 999 samples at 48 kHz → 20 ms
    assert(Multimodal.decodeAudio(Multimodal.wavBytes(48000, 1, 16, 999))._5 == 20L)
    // non-PCM WAV (format tag != 1) → stub, never fabricated fields
    val nonPcm = Multimodal.wavBytes(44100, 2, 16, 100)
    nonPcm(20) = 3 // IEEE float tag
    assert(Multimodal.decodeAudio(nonPcm)._1 == "stub")
    // AU with a non-PCM encoding → stub; truncated headers → stub
    val mulaw = Multimodal.auBytes(8000, 1, 100)
    mulaw(15) = 1 // mu-law
    assert(Multimodal.decodeAudio(mulaw)._1 == "stub")
    assert(Multimodal.decodeAudio(Multimodal.auBytes(8000, 1, 100).take(20))._1 == "stub")
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8"))._1 == "stub")
  }

  test("farbfeld pixel resize: hand-checked 4x2 box means and odd-edge drop") {
    // id=0, 4x2: channel r(x,y) = (7x + 13y) % 256. Output 2x1:
    //   block (0,0): r over {(0,0)=0,(1,0)=7,(0,1)=13,(1,1)=20} -> 40/4 = 10
    //   block (1,0): r over {(2,0)=14,(3,0)=21,(2,1)=27,(3,1)=34} -> 96/4 = 24
    val p = Multimodal.farbfeldPixelBytes(0L, 4, 2)
    val (w, h, ow, oh, sr, _, _) = Multimodal.decodeFarbfeldResize(p)
    assert((w, h, ow, oh) == (4L, 2L, 2L, 1L))
    assert(sr == 10L + 24L, s"hand-computed red sum mismatch: $sr")
    // odd dims: 5x3 -> 2x1 (floor), the edge row/column must not leak
    // into any block sum
    val podd = Multimodal.farbfeldPixelBytes(0L, 5, 3)
    val (_, _, ow2, oh2, sr2, _, _) = Multimodal.decodeFarbfeldResize(podd)
    assert((ow2, oh2) == (2L, 1L))
    assert(sr2 == sr, "edge pixels leaked into the downsample")
  }

  test("decode falls back to the md5 stub for text payloads — even BM/farbfeld prefixes") {
    for (s <- Seq("plain document text", "BM is a text prefix long enough to pass the length gate",
                  "farbfeld is also just a word in this sentence",
                  "GIF89a looks like a magic but this text has no NUL aspect byte")) {
      val payload = s.getBytes("UTF-8")
      val (fmt, w, h, f) = Multimodal.decode(payload)
      assert(fmt == "stub", s"'$s' misparsed as $fmt")
      assert((w, h, f) == Multimodal.decodeStub(payload))
    }
  }
}
