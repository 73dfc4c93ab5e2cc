package graft.ext

import graft.SparkTestBase

/** Matroska/WebM EBML header walk — exact assertions over real-format
  * bytes (the MultimodalContainerSpec pattern): VINT framing, both
  * docTypes, video/audio track dispatch, the float-rate exactness
  * contract, unknown-size segments, and malformed-yields-no-rows.
  */
class MkvSpec extends SparkTestBase {

  test("mkvTracks: webm video+audio walk back exactly") {
    val bytes = Multimodal.encodeMkv("webm", 1000000L, "graftmux 2", Seq(
      (1L, true, "V_VP9", 1920L, 1080L),
      (2L, false, "A_OPUS", 2L, 48000L)))
    val ts = Multimodal.mkvTracks(91L, bytes)
    assert(ts == Seq(
      Multimodal.MkvTrack(91L, valid = true, "webm", 1000000L, "graftmux 2",
        1L, 1, "V_VP9", 1920L, 1080L, 0L, 0L),
      Multimodal.MkvTrack(91L, valid = true, "webm", 1000000L, "graftmux 2",
        2L, 2, "A_OPUS", 0L, 0L, 2L, 48000L)))
  }

  test("mkvTracks: matroska docType and a non-default timestamp scale") {
    val bytes = Multimodal.encodeMkv("matroska", 100000L, "x", Seq(
      (3L, false, "A_AAC", 1L, 44100L)))
    val ts = Multimodal.mkvTracks(92L, bytes)
    assert(ts.size == 1 && ts.head.doc_type == "matroska" &&
      ts.head.timestamp_scale == 100000L && ts.head.sampling_rate == 44100L)
  }

  test("mkvTracks: unknown-size segment (streamed file) extends to end of buffer") {
    val bytes = Multimodal.encodeMkv("webm", 1000000L, "s", Seq(
      (1L, true, "V_VP9", 640L, 360L)))
    // locate the Segment element (id 0x18538067) and overwrite its
    // size VINT with the 1-byte unknown marker 0xFF — the size is a
    // 2-byte VINT here, so shift the body left by one
    val seg = (0 until bytes.length - 4).indexWhere(i =>
      (bytes(i) & 0xff) == 0x18 && (bytes(i + 1) & 0xff) == 0x53 &&
        (bytes(i + 2) & 0xff) == 0x80 && (bytes(i + 3) & 0xff) == 0x67)
    assert(seg >= 0)
    val szLen = 8 - (31 - Integer.numberOfLeadingZeros(bytes(seg + 4) & 0xff))
    val streamed = bytes.take(seg + 4) ++ Array(0xff.toByte) ++
      bytes.drop(seg + 4 + szLen)
    val ts = Multimodal.mkvTracks(93L, streamed)
    assert(ts.size == 1 && ts.head.pixel_width == 640L)
  }

  test("mkvTracks: non-integral sampling rate is malformed, never rounded") {
    val bytes = Multimodal.encodeMkv("webm", 1000000L, "s", Seq(
      (1L, false, "A_OPUS", 2L, 48000L)))
    // the 8-byte float payload is the last 8 bytes of the stream
    // (audio element closes the track) — overwrite with 44100.5
    val bits = java.lang.Double.doubleToLongBits(44100.5)
    val hostile = bytes.clone()
    (0 until 8).foreach(i => hostile(hostile.length - 8 + i) =
      ((bits >> (8 * (7 - i))) & 0xff).toByte)
    assert(Multimodal.mkvTracks(94L, hostile).isEmpty)
  }

  test("mkvTracks: malformed reads no rows, never a crash") {
    val bytes = Multimodal.encodeMkv("webm", 1000000L, "s", Seq(
      (1L, true, "V_VP9", 640L, 360L)))
    assert(Multimodal.mkvTracks(95L, "EBML?".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.mkvTracks(96L, bytes.take(bytes.length / 2)).isEmpty)
    // a child size overrunning its parent must end as no-rows, not
    // index out of bounds: corrupt the Tracks size byte upward
    val tracksId = (0 until bytes.length - 4).indexWhere(i =>
      (bytes(i) & 0xff) == 0x16 && (bytes(i + 1) & 0xff) == 0x54 &&
        (bytes(i + 2) & 0xff) == 0xae && (bytes(i + 3) & 0xff) == 0x6b)
    assert(tracksId >= 0)
    val overrun = bytes.clone()
    overrun(tracksId + 4) = 0xbf.toByte // 1-byte VINT size 63 > remaining
    assert(Multimodal.mkvTracks(97L, overrun).isEmpty)
  }

  test("mkvTracks: empty/prefix/header-only inputs read no rows, never a crash (r16 ADVICE offsets)") {
    // empty content
    assert(Multimodal.mkvTracks(98L, Array.emptyByteArray).isEmpty)
    // a bare 4-byte EBML-ID prefix: readSize(4) lands exactly at the
    // buffer end
    assert(Multimodal.mkvTracks(99L,
      Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte)).isEmpty)
    // EBML header with no Segment: readId(so) with so == n
    val full = Multimodal.encodeMkv("webm", 1000000L, "s", Seq(
      (1L, true, "V_VP9", 640L, 360L)))
    val (hsz, hsl) = {
      // header size VINT starts at offset 4; minimal-length encoding
      val b = full(4) & 0xff
      val l = 8 - (31 - Integer.numberOfLeadingZeros(b))
      var v = (b & ((1 << (8 - l)) - 1)).toLong
      (1 until l).foreach(i => v = (v << 8) | (full(4 + i) & 0xffL))
      (v, l)
    }
    val headerOnly = full.take(4 + hsl + hsz.toInt)
    assert(Multimodal.mkvTracks(100L, headerOnly).isEmpty)
    // a stray byte after the (sized) Segment sits outside the walk:
    // must not crash, and the tracks read the same as the clean file
    assert(Multimodal.mkvTracks(101L, full :+ 0xae.toByte).map(_.codec_id) ==
      Multimodal.mkvTracks(101L, full).map(_.codec_id))
    // an UNKNOWN-size segment whose last element id ends exactly at
    // the buffer end: the next readId lands at o == n — no crash
    assert(Multimodal.mkvTracks(103L,
      Array(0x1a, 0x45, 0xdf, 0xa3, 0x81, 0x00).map(_.toByte)).isEmpty)
  }

  test("mkvTracks: malformed Video/Audio sub-block fails the track, no partial geometry (r16 ADVICE)") {
    val bytes = Multimodal.encodeMkv("webm", 1000000L, "s", Seq(
      (1L, true, "V_VP9", 640L, 360L)))
    // corrupt the Video sub-block's size VINT upward so a child
    // overruns the parent: locate the Video master id 0xE0 inside the
    // TrackEntry and bump its size byte
    val vid = (0 until bytes.length - 1).indexWhere(i =>
      (bytes(i) & 0xff) == 0xe0 && (bytes(i + 1) & 0xff) != 0)
    assert(vid >= 0)
    val bad = bytes.clone()
    bad(vid + 1) = 0xbf.toByte // 1-byte VINT size 63 — overruns parent
    assert(Multimodal.mkvTracks(102L, bad).isEmpty)
  }
}
