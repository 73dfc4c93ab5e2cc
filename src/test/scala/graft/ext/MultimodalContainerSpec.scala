package graft.ext

import graft.SparkTestBase

/** Real WAV (RIFF) and MP4 (ISO box) container metadata — exact
  * assertions over real-format bytes, the MultimodalImageSpec pattern
  * applied to the audio/video containers. The WAV walk is additionally
  * cross-checked against the JDK's OWN RIFF reader
  * (javax.sound.sampled.AudioSystem): two independent parsers, one
  * byte stream, same answer.
  */
class MultimodalContainerSpec extends SparkTestBase {

  import spark.implicits._

  test("wavMetadata: exact duration/layout on a real RIFF/WAVE stream; JDK AudioSystem agrees") {
    // 8 kHz mono 16-bit, 8000 samples = exactly 1000 ms
    val pcm = Array.tabulate[Byte](16000)(i => (i % 251).toByte)
    val wav = Multimodal.encodeWav(8000, 1, 16, pcm)
    val m = Multimodal.wavMetadata(7L, wav)
    assert(m == Multimodal.ContainerMeta(7L, valid = true, "wav",
      1000L, 1, 8000, 1, 16, 8000L))

    // the JDK's independent RIFF parser accepts the bytes and reads
    // the identical layout — proof the encoder writes REAL WAV
    val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(wav))
    assert(fmt.getType == javax.sound.sampled.AudioFileFormat.Type.WAVE)
    assert(fmt.getFormat.getSampleRate == 8000f)
    assert(fmt.getFormat.getChannels == 1)
    assert(fmt.getFormat.getSampleSizeInBits == 16)
    assert(fmt.getFrameLength == 8000)

    // stereo 44.1 kHz: 22050 frames = 500 ms
    val pcm2 = new Array[Byte](22050 * 2 * 2)
    val m2 = Multimodal.wavMetadata(8L, Multimodal.encodeWav(44100, 2, 16, pcm2))
    assert(m2 == Multimodal.ContainerMeta(8L, valid = true, "wav",
      500L, 1, 44100, 2, 16, 22050L))
  }

  test("wavMetadata: extra chunks, odd-size padding, truncation, and garbage") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // hand-build: RIFF [LIST(5 bytes, padded)] [fmt ] [data] — real
    // files carry metadata chunks before fmt; odd sizes take a pad byte
    val base = Multimodal.encodeWav(16000, 1, 8, Array.tabulate[Byte](4000)(_.toByte))
    val list = "LIST".getBytes("US-ASCII") ++ le32(5) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val withList = base.take(12) ++ list ++ base.drop(12)
    // fix the RIFF size field (bytes 4-7) for the inserted chunk
    val fixed = withList.take(4) ++ le32(withList.length - 8) ++ withList.drop(8)
    val m = Multimodal.wavMetadata(1L, fixed)
    assert(m == Multimodal.ContainerMeta(1L, valid = true, "wav",
      250L, 1, 16000, 1, 8, 4000L))

    // truncated data chunk: declared 4000, only 1000 present → clamps
    val cut = base.take(base.length - 3000)
    val mt = Multimodal.wavMetadata(2L, cut)
    assert(mt.valid && mt.n_samples == 1000L && mt.duration_ms == 62L)

    assert(!Multimodal.wavMetadata(3L, "RIFFxxxxNOPE".getBytes("US-ASCII")).valid)
    assert(!Multimodal.wavMetadata(4L, Array[Byte](1, 2, 3)).valid)
  }

  test("mp4Metadata: exact duration and track count from mvhd/trak; v1 and largesize handled") {
    // timescale 600, duration 1800 → exactly 3000 ms, 2 tracks
    val mp4 = Multimodal.encodeMp4(600, 1800, nTracks = 2,
      payload = Array.tabulate[Byte](100)(_.toByte))
    val m = Multimodal.mp4Metadata(11L, mp4)
    assert(m == Multimodal.ContainerMeta(11L, valid = true, "mp4",
      3000L, 2, 0, 0, 0, 0L))

    // version-1 mvhd (8-byte ctime/mtime/duration): timescale 90000,
    // duration 45000 → 500 ms
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32((v >> 32).toInt) ++ be32(v.toInt)
    def box(t: String, b: Array[Byte]) = be32(b.length + 8) ++ t.getBytes("US-ASCII") ++ b
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++
      be32(90000) ++ be64(45000L) ++ Array.fill[Byte](80)(0))
    val v1 = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", mvhd1 ++ box("trak", Array.fill[Byte](8)(0)))
    val m1 = Multimodal.mp4Metadata(12L, v1)
    assert(m1 == Multimodal.ContainerMeta(12L, valid = true, "mp4",
      500L, 1, 0, 0, 0, 0L))

    // 64-bit largesize mdat between ftyp and moov is skipped by size
    val big = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      (be32(1) ++ "mdat".getBytes("US-ASCII") ++ be64(16L + 24L) ++ new Array[Byte](24)) ++
      box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32(2500) ++ Array.fill[Byte](80)(0)))
    val mb = Multimodal.mp4Metadata(13L, big)
    assert(mb.valid && mb.duration_ms == 2500L && mb.n_tracks == 0)

    // no ftyp → not an mp4; moov missing → invalid
    assert(!Multimodal.mp4Metadata(14L, box("moov", be32(0))).valid)
    assert(!Multimodal.mp4Metadata(15L,
      box("ftyp", "isom".getBytes("US-ASCII"))).valid)
  }

  test("hostile inputs: huge RIFF chunk sizes terminate the walk; sign-bit mvhd durations route invalid") {
    def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // chunk size 0xFFFFFFF8: as Int this is -8 (a walk that advances by
    // it stalls forever); the Long-advance walk must terminate and
    // return whatever parsed — here nothing valid
    val hostile = "RIFF".getBytes("US-ASCII") ++ le32(0xFFFFFFF0L) ++
      "WAVE".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(0xFFFFFFF8L) ++ new Array[Byte](64)
    val m = Multimodal.wavMetadata(1L, hostile) // must return, not hang
    assert(!m.valid)
    // a valid fmt BEFORE the hostile chunk still parses (walk ends at
    // the bad advance, keeping what it saw)
    val good = Multimodal.encodeWav(8000, 1, 16, new Array[Byte](1600))
    val tail = "evil".getBytes("US-ASCII") ++ le32(0xFFFFFFF8L) ++ new Array[Byte](8)
    val mixed = good ++ tail
    val m2 = Multimodal.wavMetadata(2L, mixed)
    assert(m2.valid && m2.sample_rate == 8000 && m2.n_samples == 800L)

    // v1 mvhd with the duration sign bit set: valid=false, never a
    // negative duration_ms a threshold filter would silently misroute
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32((v >> 32).toInt) ++ be32(v.toInt)
    def box(t: String, b: Array[Byte]) = be32(b.length + 8) ++ t.getBytes("US-ASCII") ++ b
    val evilMvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++
      be32(90000) ++ be64(java.lang.Long.MIN_VALUE) ++ Array.fill[Byte](80)(0))
    val evil = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++ box("moov", evilMvhd)
    assert(!Multimodal.mp4Metadata(3L, evil).valid)
    // absurd-but-positive duration that overflows *1000 also invalid
    val bigMvhd = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++
      be32(90000) ++ be64(Long.MaxValue / 100L) ++ Array.fill[Byte](80)(0))
    val big = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++ box("moov", bigMvhd)
    assert(!Multimodal.mp4Metadata(4L, big).valid)
  }

  test("mp4Tracks: per-track id/duration/resolution from tkhd; v0 16.16 fixed-point exact; audio tracks zero-sized") {
    // movie timescale 1000, duration 90000 → 90 s; track 1 is 1920×1080
    // video for the full movie, track 2 audio (0×0), track 3 a shorter
    // 640×480 overlay
    val mp4 = Multimodal.encodeMp4(1000, 90000, nTracks = 3,
      trackDims = Seq((90000, 1920, 1080), (90000, 0, 0), (30000, 640, 480)))
    val tracks = Multimodal.mp4Tracks(5L, mp4)
    assert(tracks == Seq(
      Multimodal.TrackMeta(5L, 1L, 90000L, 1920.0, 1080.0),
      Multimodal.TrackMeta(5L, 2L, 90000L, 0.0, 0.0),
      Multimodal.TrackMeta(5L, 3L, 30000L, 640.0, 480.0)))
    // mp4Metadata agrees on the track count, and the movie duration is
    // the mvhd's, not any track's
    val m = Multimodal.mp4Metadata(5L, mp4)
    assert(m.n_tracks == 3 && m.duration_ms == 90000L)
    // garbage and non-mp4 containers yield NO rows, never bogus ones
    assert(Multimodal.mp4Tracks(6L, "not a container".getBytes).isEmpty)
    assert(Multimodal.mp4Tracks(7L, Multimodal.encodeWav(8000, 1, 16,
      Array.fill[Byte](64)(3))).isEmpty)

    // the dataset path: one row per track, resolution filterable
    // BEFORE any payload decode — the route-by-resolution curation step
    val rows = Seq(
      Multimodal.MediaRow(5L, "video", mp4),
      Multimodal.MediaRow(6L, "video", Multimodal.encodeMp4(600, 1200, nTracks = 1,
        trackDims = Seq((1200, 320, 240)))))
    val table = Multimodal.trackTable(rows.toDS())
    assert(table.count() == 4)
    import org.apache.spark.sql.functions.col
    val hd = table.filter(col("width") >= 1280).select("media_id", "track_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hd == Seq((5L, 1L)))
  }

  test("containerMetadata dispatches wav/mp4/grft/unknown per row in one pass") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", Multimodal.encodeWav(8000, 1, 16,
        new Array[Byte](16000))),
      Multimodal.MediaRow(2L, "video", Multimodal.encodeMp4(600, 600, 1)),
      Multimodal.MediaRow(3L, "video", Multimodal.encode(64, 48, 10,
        Array[Byte](1, 2, 3))),
      Multimodal.MediaRow(4L, "junk", Array[Byte](9, 9, 9, 9)))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.containerMetadata(ds).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L) == Multimodal.ContainerMeta(1L, valid = true, "wav",
      1000L, 1, 8000, 1, 16, 8000L))
    assert(out(2L) == Multimodal.ContainerMeta(2L, valid = true, "mp4",
      1000L, 1, 0, 0, 0, 0L))
    assert(out(3L) == Multimodal.ContainerMeta(3L, valid = true, "grft",
      0L, 1, 0, 0, 0, 10L))
    assert(out(4L) == Multimodal.ContainerMeta(4L, valid = false, "unknown",
      0L, 0, 0, 0, 0, 0L))
  }

  test("mp4SampleStats: exact codec/samples/bytes/chunks/duration/bitrate from the stbl walk") {
    // track 1: avc1 @ 90 kHz, 300 uniform 5000-byte samples over one
    // (300, 3000) stts run → 900000/90000 = 10 s; 1.5 MB → 1.2 Mbps
    // track 2: mp4a @ 44.1 kHz, per-sample size table 100+200+300+400,
    // one (4, 1024) run → 4096/44100 = 92 ms; 1000 B → 86956 bps
    val mp4 = Multimodal.encodeMp4Sampled(1000, 10000, Seq(
      ("avc1", 90000, Seq.fill(300)(5000L), Seq((300L, 3000L)), 10),
      ("mp4a", 44100, Seq(100L, 200L, 300L, 400L), Seq((4L, 1024L)), 2)))
    assert(Multimodal.mp4SampleStats(9L, mp4) == Seq(
      Multimodal.SampleStats(9L, 1L, "avc1", 90000L, 300L, 1500000L, 10L,
        10000L, 1200000L),
      Multimodal.SampleStats(9L, 2L, "mp4a", 44100L, 4L, 1000L, 2L,
        92L, 86956L)))

    // multi-run stts + forced size table with equal sizes: 10·100 +
    // 5·200 = 2000 units @ ts 1000 → 2000 ms; 15 × 100 B = 1500 B
    val multi = Multimodal.encodeMp4Sampled(1000, 2000, Seq(
      ("hvc1", 1000, Seq.fill(15)(100L), Seq((10L, 100L), (5L, 200L)), 3)),
      forceSizeTable = true)
    assert(Multimodal.mp4SampleStats(10L, multi) == Seq(
      Multimodal.SampleStats(10L, 1L, "hvc1", 1000L, 15L, 1500L, 3L,
        2000L, 6000L)))

    // a DESYNCED sample table (stsz says 3 samples, stts says 4) is
    // malformed: no row, never a bogus one
    val desync = Multimodal.encodeMp4Sampled(1000, 40, Seq(
      ("avc1", 1000, Seq(100L, 100L, 100L), Seq((4L, 10L)), 1)))
    assert(Multimodal.mp4SampleStats(11L, desync).isEmpty)
    // and plain metadata-only mp4s (no stbl) yield no row either
    assert(Multimodal.mp4SampleStats(12L,
      Multimodal.encodeMp4(600, 600, nTracks = 2)).isEmpty)

    // the dataset face: route H.264/HEVC files by codec + bitrate with
    // payloads never decoded — the curation step the JDK-codec gap
    // cannot block
    val rows = Seq(
      Multimodal.MediaRow(9L, "video", mp4),
      Multimodal.MediaRow(10L, "video", multi))
    val table = Multimodal.sampleStatsTable(rows.toDS())
    import org.apache.spark.sql.functions.col
    val lowRate = table.filter(col("codec").isin("avc1", "hvc1") &&
        col("bitrate_bps") < 1000000)
      .select("media_id", "track_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lowRate == Seq((10L, 1L)))
  }

  test("mp3Metadata: exact frame walk — CBR, VBR detection, MPEG2, ID3 skip, truncation") {
    // 10 MPEG1 Layer III frames @ 128 kbps, 44.1 kHz stereo:
    // frameLen = 144·128000/44100 = 417 B; 11520 samples = 261 ms;
    // 4170 B → 4170·8000/261 = 127816 bps
    val cbr = Multimodal.encodeMp3(Seq.fill(10)((9, 0, true, false)))
    assert(Multimodal.mp3Metadata(21L, cbr) == Multimodal.Mp3Meta(21L,
      valid = true, 10L, 261L, 44100, 2, 11520L, 127816L, vbr = false))

    // alternating 128/224 kbps frames → VBR flagged
    val vbr = Multimodal.encodeMp3(
      (0 until 6).map(i => (if (i % 2 == 0) 9 else 12, 0, true, false)))
    val mv = Multimodal.mp3Metadata(22L, vbr)
    assert(mv.valid && mv.vbr && mv.n_frames == 6L)

    // MPEG2 Layer III mono @ 40 kbps, 24 kHz: frameLen = 72·40000/24000
    // = 120 B, 576 samples = 24 ms per frame → exactly 40000 bps
    val m2 = Multimodal.mp3Metadata(23L,
      Multimodal.encodeMp3(Seq.fill(5)((5, 1, false, true))))
    assert(m2 == Multimodal.Mp3Meta(23L, valid = true, 5L, 120L, 24000, 1,
      2880L, 40000L, vbr = false))

    // an ID3v2 prefix is skipped by its syncsafe size — stats unchanged
    val tagged = Multimodal.encodeMp3(Seq.fill(10)((9, 0, true, false)),
      id3Bytes = 300)
    val mt = Multimodal.mp3Metadata(24L, tagged)
    assert(mt.n_frames == 10L && mt.duration_ms == 261L && mt.valid)

    // a truncated final frame ends the walk cleanly: 9 complete frames
    val cut = Multimodal.mp3Metadata(25L, cbr.take(cbr.length - 10))
    assert(cut.valid && cut.n_frames == 9L)

    // garbage and other formats never misroute: GRFT, PNG, empty
    assert(!Multimodal.mp3Metadata(26L, Array[Byte](9, 9, 9)).valid)
    assert(!Multimodal.isMp3(Multimodal.encode(8, 8, 2, Array[Byte](1))))
    assert(!Multimodal.isMp3(Multimodal.encodePng(4, 4)((_, _) => 0xffffff)))

    // dispatch: containerMetadata routes the mp3 beside wav/mp4 rows
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(27L, "audio", cbr),
      Multimodal.MediaRow(28L, "audio", Multimodal.encodeWav(8000, 1, 16,
        new Array[Byte](16000)))))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.containerMetadata(ds).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(27L) == Multimodal.ContainerMeta(27L, valid = true, "mp3",
      261L, 1, 44100, 2, 0, 11520L))
    assert(out(28L).container == "wav" && out(28L).valid)
  }

  test("mp4SampleStats: crafted 32-bit fields that wrap a Long yield NO row") {
    // locate an ASCII box name and overwrite a be32 field inside its
    // body — the crafted-header shapes the walk must refuse exactly
    def patch(bytes: Array[Byte], boxName: String, bodyOff: Int, v: Long): Array[Byte] = {
      val out = bytes.clone()
      val idx = out.indices.find(i => i + 4 <= out.length &&
        new String(out, i, 4, "US-ASCII") == boxName).get
      val o = idx + 4 + bodyOff
      out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      out
    }
    val base = Multimodal.encodeMp4Sampled(1000, 1000, Seq(
      ("avc1", 12800, Seq(500L, 500L), Seq((2L, 256L)), 1)))
    assert(Multimodal.mp4SampleStats(1L, base).nonEmpty)
    // uniform-stsz path: uniform ~2^32-1 with count ~2^32-1 wraps the
    // Long product positive — must route to the no-row path
    val szWrap = patch(patch(base, "stsz", 8, 0xFFFFFFFFL), "stsz", 4, 0xFFFFFFFFL)
    assert(Multimodal.mp4SampleStats(2L, szWrap).isEmpty)
    // stts run: count*delta at (2^32-1)^2 wraps positive past the
    // old >= 0 guard — must route to the no-row path
    val ttsWrap = patch(patch(base, "stts", 8, 0xFFFFFFFFL), "stts", 12, 0xFFFFFFFFL)
    assert(Multimodal.mp4SampleStats(3L, ttsWrap).isEmpty)
  }

  test("h264SpsParse: hand-built SPS bits decode to the exact coded geometry") {
    // 640x480 baseline: profile 66, constraints 0, level 30, then
    // ue(sps_id=0)=1, ue(log2mfn=0)=1, ue(poc=2)=011, ue(maxref=1)=010,
    // gaps=0, ue(wMbs=39)=00000 101000, ue(hMus=29)=0000 11110,
    // frame_mbs_only=1, direct8x8=1, crop=0, vui=0, stop=1
    def bitsToBytes(s: String): Array[Byte] = {
      val padded = s + "0" * ((8 - s.length % 8) % 8)
      padded.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
    }
    val rbsp = "01000010" + "00000000" + "00011110" +
      "1" + "1" + "011" + "010" + "0" +
      "00000101000" + "000011110" + "1" + "1" + "0" + "0" + "1"
    val nal = Array(0x67.toByte) ++ bitsToBytes(rbsp)
    assert(Multimodal.h264SpsParse(nal) == Some((66, 30, 640L, 480L)))
    // encoder round trips the same geometry
    assert(Multimodal.h264SpsParse(Multimodal.encodeSps(66, 30, 39, 29)) ==
      Some((66, 30, 640L, 480L)))
    // 1080p high profile: 120x68 macroblocks, 4 chroma-unit bottom crop
    // (1088 - 2*4 = 1080) — the classic coded-vs-presentation case
    assert(Multimodal.h264SpsParse(
      Multimodal.encodeSps(100, 41, 119, 67, cropRight = 0, cropBottom = 4)) ==
      Some((100, 41, 1920L, 1080L)))
    // malformed shapes yield None, never garbage: truncation, a
    // non-SPS NAL type, empty input
    assert(Multimodal.h264SpsParse(nal.take(4)).isEmpty)
    assert(Multimodal.h264SpsParse(
      Array(0x61.toByte) ++ bitsToBytes(rbsp)).isEmpty)
    assert(Multimodal.h264SpsParse(Array.emptyByteArray).isEmpty)
  }

  test("mp4CodedVideo: avcC walk recovers the SPS through a real stsd entry") {
    val nal = Multimodal.encodeSps(100, 40, 79, 44, cropRight = 2, cropBottom = 1)
    val bytes = Multimodal.encodeMp4Sampled(1000, 1000, Seq(
      ("avc1", 12800, Seq.fill(5)(100L), Seq((5L, 256L)), 1)),
      sps = Map(0 -> nal))
    val rows = Multimodal.mp4CodedVideo(7L, bytes)
    assert(rows == Seq(Multimodal.CodedVideo(7L, 1L, 100, 40,
      80 * 16 - 4L, 45 * 16 - 2L)))
    // the sample-table walk still reads the SPS-bearing entry's codec
    assert(Multimodal.mp4SampleStats(7L, bytes).map(_.codec) == Seq("avc1"))
    // a track without an avcC record yields no coded-video row
    val plain = Multimodal.encodeMp4Sampled(1000, 1000, Seq(
      ("mp4a", 48000, Seq.fill(5)(100L), Seq((5L, 256L)), 1)))
    assert(Multimodal.mp4CodedVideo(8L, plain).isEmpty)
  }

  test("flacMetadata: STREAMINFO fields decode exactly; malformed yields invalid") {
    val f = Multimodal.encodeFlac(44100, 2, 16, 441000L)
    assert(Multimodal.flacMetadata(31L, f) == Multimodal.FlacMeta(31L,
      valid = true, 44100, 2, 16, 441000L, 10000L, 4096, 4096))
    // field extremes: 8 channels, 24-bit, a 36-bit sample count
    val hi = Multimodal.encodeFlac(96000, 8, 24, (1L << 35) + 7L, 16, 65535)
    val m = Multimodal.flacMetadata(32L, hi)
    assert(m.valid && m.sample_rate == 96000 && m.channels == 8 &&
      m.bits_per_sample == 24 && m.n_samples == (1L << 35) + 7L &&
      m.min_block_size == 16 && m.max_block_size == 65535)
    assert(!Multimodal.flacMetadata(33L, f.take(20)).valid)
    assert(!Multimodal.flacMetadata(34L, "fLaX0000".getBytes("US-ASCII")).valid)
    // a zero sample rate is malformed by spec even if well-framed
    val z = f.clone()
    // packed rate field starts at byte 18 (magic 4 + header 4 + 10)
    z(18) = 0; z(19) = 0; z(20) = 0x0f
    assert(!Multimodal.flacMetadata(35L, z).valid)
  }

  test("oggMetadata: page walk — vorbis and opus ID headers, granule-exact duration") {
    val v = Multimodal.encodeOgg("vorbis", 44100, 2, 3, 4410L)
    assert(Multimodal.oggMetadata(41L, v) == Multimodal.OggMeta(41L,
      valid = true, "vorbis", 44100, 2, 4L, 13230L, 300L))
    // Opus: granules at 48 kHz, pre-skip subtracted
    val o = Multimodal.encodeOgg("opus", 48000, 1, 2, 960L, preSkip = 312)
    assert(Multimodal.oggMetadata(42L, o) == Multimodal.OggMeta(42L,
      valid = true, "opus", 48000, 1, 3L, 1920L, 40L))
    // truncated page table / unknown first packet / not a page
    assert(!Multimodal.oggMetadata(43L, v.take(20)).valid)
    val junkFirst = Multimodal.encodeOgg("vorbis", 44100, 2, 1, 0L)
    junkFirst(junkFirst.indexOf('v'.toByte)) = 'x'.toByte
    assert(!Multimodal.oggMetadata(45L, junkFirst).valid)
    assert(!Multimodal.oggMetadata(46L, "NotOggAtAll".getBytes("US-ASCII")).valid)
  }

  test("h265SpsParse: HEVC geometry is direct luma sizes minus chroma-unit conformance crops") {
    // 1080p Main profile: luma 1920x1088, bottom crop 4 chroma units
    assert(Multimodal.h265SpsParse(
      Multimodal.encodeSpsHevc(1, 120, 1920L, 1088L, cropRight = 0, cropBottom = 4)) ==
      Some((1, 120, 1920L, 1080L)))
    // odd geometry H.264 cannot express (non-macroblock-multiple)
    assert(Multimodal.h265SpsParse(
      Multimodal.encodeSpsHevc(2, 90, 1366L, 768L)) == Some((2, 90, 1366L, 768L)))
    // malformed: truncation, wrong NAL type, empty
    val nal = Multimodal.encodeSpsHevc(1, 120, 640L, 480L)
    assert(Multimodal.h265SpsParse(nal.take(6)).isEmpty)
    assert(Multimodal.h265SpsParse(Array((32 << 1).toByte, 1.toByte) ++ nal.drop(2)).isEmpty)
    assert(Multimodal.h265SpsParse(Array.emptyByteArray).isEmpty)
  }

  test("mp4CodedVideo: hvcC walk recovers the H.265 SPS through a real hvc1 entry") {
    val nal = Multimodal.encodeSpsHevc(1, 123, 1280L, 720L, cropRight = 3, cropBottom = 1)
    val bytes = Multimodal.encodeMp4Sampled(1000, 1000, Seq(
      ("hvc1", 25600, Seq.fill(4)(200L), Seq((4L, 512L)), 2)),
      sps = Map(0 -> nal))
    assert(Multimodal.mp4CodedVideo(9L, bytes) ==
      Seq(Multimodal.CodedVideo(9L, 1L, 1, 123, 1280L - 6L, 720L - 2L)))
    // the sample-table walk coexists on the same entry
    assert(Multimodal.mp4SampleStats(9L, bytes).map(_.codec) == Seq("hvc1"))
  }

  test("jpegExif: TIFF IFD walk in both byte orders, offset ASCII, inline shorts") {
    val be = Multimodal.encodeJpegExif(6, "Canon", "EOS R5 Mark II",
      "2024:05:01 10:20:30", 8192L, 5464L, bigEndian = true)
    assert(Multimodal.jpegExif(61L, be) == Multimodal.ExifMeta(61L,
      valid = true, "MM", 6, "Canon", "EOS R5 Mark II",
      "2024:05:01 10:20:30", 8192L, 5464L))
    val le = Multimodal.encodeJpegExif(8, "ab", "x", "2020:01:01 00:00:00",
      640L, 480L, bigEndian = false)
    val m = Multimodal.jpegExif(62L, le)
    // "ab"/"x" + NUL fit the 4-byte inline value cell
    assert(m.valid && m.byte_order == "II" && m.orientation == 8 &&
      m.make == "ab" && m.model == "x" && m.pixel_width == 640L)
    // malformed shapes: no SOI, truncated APP1, a PNG, no-EXIF JPEG
    assert(!Multimodal.jpegExif(63L, be.take(10)).valid)
    assert(!Multimodal.jpegExif(64L, Multimodal.encodePng(4, 4)((_, _) => 0)).valid)
    assert(!Multimodal.jpegExif(65L, Array(0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).valid)
    // a crafted IFD0 offset that wraps negative through toInt must
    // read invalid, not throw (the TIFF origin's 4-byte offset cell
    // is at tiff+4 = byte 16 of the file for this encoder)
    val hostile = be.clone()
    hostile(16) = 0xff.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0xf0.toByte
    assert(!Multimodal.jpegExif(66L, hostile).valid)
  }

  test("h265SpsParse: sub-layer PTL flags are walked, not assumed absent") {
    // hand-build: 1 sub-layer with both present flags 0 — the parser
    // must consume the two flags and the 14-pair alignment before the
    // geometry fields; the encoder cannot produce this shape
    def bitsToBytes(s: String): Array[Byte] = {
      val padded = s + "0" * ((8 - s.length % 8) % 8)
      padded.grouped(8).map(g => Integer.parseInt(g, 2).toByte).toArray
    }
    val rbsp = "0000" +            // vps_id
      "001" +                      // sps_max_sub_layers_minus1 = 1
      "1" +                        // nesting
      "00" + "0" + "00001" +       // space, tier, profile 1
      "0" * 32 + "0" * 48 +        // compat + reserved
      "01111000" +                 // level 120
      "00" +                       // sub-layer profile/level present = 0,0
      "00" * 7 +                   // alignment to 8 sub-layers
      "1" +                        // ue(sps_id=0)
      "010" +                      // ue(chroma=1)
      "000000000" + "1010000001" + // ue(640): 641 = 0b1010000001, 9 leading zeros
      "00000000" + "111100001" +   // ue(480): 481 = 0b111100001, 8 leading zeros
      "0" +                        // conformance_window_flag
      "1"                          // stop bit
    val nal = Array((33 << 1).toByte, 1.toByte) ++ bitsToBytes(rbsp)
    assert(Multimodal.h265SpsParse(nal) == Some((1, 120, 640L, 480L)))
  }

  test("id3Tags: v2.3 plain and v2.4 syncsafe frame sizes, all three text encodings, padding, MP3 interplay") {
    val v4 = Multimodal.encodeId3(4, Seq(
      ("TIT2", 3, "Grüße aus Köln"), // UTF-8
      ("TPE1", 1, "Ärtist"),          // UTF-16 w/ BOM
      ("TALB", 0, "Plain Album"),     // latin-1
      ("TXXX", 3, "ignored-custom")), padding = 32)
    assert(Multimodal.id3Tags(71L, v4) == Multimodal.Id3Meta(71L,
      valid = true, 4, "Grüße aus Köln", "Ärtist", "Plain Album"))
    val v3 = Multimodal.encodeId3(3, Seq(("TIT2", 0, "Old School")))
    assert(Multimodal.id3Tags(72L, v3) ==
      Multimodal.Id3Meta(72L, valid = true, 3, "Old School", "", ""))
    // tagged MP3: the tag walk reads INSIDE what the frame walk skips,
    // and the frame walk still counts every frame behind the tag
    val tagged = v4 ++ Multimodal.encodeMp3(Seq.fill(3)((5, 0, true, false)))
    assert(Multimodal.id3Tags(73L, tagged).title == "Grüße aus Köln")
    assert(Multimodal.mp3Metadata(73L, tagged).n_frames == 3L)
    // malformed: not a tag, unsupported version, truncated mid-frame
    assert(!Multimodal.id3Tags(74L, "IDX".getBytes("US-ASCII")).valid)
    assert(!Multimodal.id3Tags(75L, { val b = v4.clone(); b(3) = 2; b }).valid)
    val cut = Multimodal.id3Tags(76L, v4.take(24))
    assert(cut.valid && cut.title == "") // frame overruns the cut: walked over
  }

  test("dispatch: flac and ogg route beside wav/mp4/mp3") {
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(51L, "audio", Multimodal.encodeFlac(48000, 2, 24, 96000L)),
      Multimodal.MediaRow(52L, "audio", Multimodal.encodeOgg("opus", 48000, 2, 4, 960L))))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val out = Multimodal.containerMetadata(ds).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(51L) == Multimodal.ContainerMeta(51L, valid = true, "flac",
      2000L, 1, 48000, 2, 24, 96000L))
    assert(out(52L) == Multimodal.ContainerMeta(52L, valid = true, "ogg",
      80L, 1, 48000, 2, 0, 3840L))
  }

  test("id3Tags: a v2.3 frame size near Int.MaxValue reads as end-of-walk, not a crash") {
    // 21 bytes: header (size=100 syncsafe) + one TIT2 frame whose
    // PLAIN 32-bit size 0x7ffffff0 wraps `off + 10 + fsize` negative
    // in Int arithmetic — the bounds check must be done in Long or
    // copyOfRange throws on a negative end
    val hostile = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 100,
      'T', 'I', 'T', '2', 0x7f, 0xff.toByte, 0xff.toByte, 0xf0.toByte, 0, 0, 3)
    val m = Multimodal.id3Tags(77L, hostile)
    assert(m.valid && m.title == "") // frame overruns: walked over, no guess
  }

  test("jpegExif: an ASCII offset cell that lands `at + n` past Int.MaxValue reads empty, not a crash") {
    val be = Multimodal.encodeJpegExif(1, "Canon", "R5", "2024:01:01 00:00:00",
      10L, 10L, bigEndian = true)
    // make ("Canon"+NUL = 6 > 4) uses an offset cell at tiff+18 =
    // file bytes 30..33; 0x7ffffff1 puts at = tiff + offset at
    // Int.MaxValue-2 (>= tiff, so the origin check passes) and
    // `at + 6` wraps negative in Int arithmetic
    val hostile = be.clone()
    hostile(30) = 0x7f; hostile(31) = 0xff.toByte
    hostile(32) = 0xff.toByte; hostile(33) = 0xf1.toByte
    val m = Multimodal.jpegExif(67L, hostile)
    assert(m.valid && m.make == "") // out-of-range cell: empty, no guess
  }

  test("oggMetadata: a granule past Long.MaxValue/1000 is malformed, never a wrapped duration") {
    val big = Long.MaxValue / 1000L + 1L
    val ogg = Multimodal.encodeOgg("vorbis", 44100, 2, 1, big)
    assert(!Multimodal.oggMetadata(78L, ogg).valid)
    // one below the cap still computes exactly
    val ok = Multimodal.encodeOgg("vorbis", 44100, 2, 1, Long.MaxValue / 1000L)
    val m = Multimodal.oggMetadata(79L, ok)
    assert(m.valid && m.duration_ms == Long.MaxValue / 1000L * 1000L / 44100L)
  }

  test("dispatch: an ID3-prefixed NON-audio blob falls through to unknown, not 'mp3'") {
    val blob = "ID3 is a tag format, but these bytes are prose".getBytes("US-ASCII")
    assert(Multimodal.isMp3(blob)) // the sniff alone would misroute it
    val ds = spark.createDataset(Seq(Multimodal.MediaRow(30L, "mixed", blob)))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val m = Multimodal.containerMetadata(ds).collect().head
    assert(!m.valid && m.container == "unknown")
  }
}
