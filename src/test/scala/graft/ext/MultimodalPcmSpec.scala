package graft.ext

import graft.SparkTestBase

/** Real WAV PCM payload decode: exact feature assertions over
  * hand-computable waveforms, a cross-check against the JDK's own
  * decoder (AudioSystem reads the same bytes; both sides' samples and
  * derived features must agree exactly), and the acoustic-envelope
  * embeddings flowing into EmbeddingSearch end to end.
  */
class MultimodalPcmSpec extends SparkTestBase {

  import spark.implicits._

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  /** 16-bit mono WAV from raw sample values. */
  private def wav16(sampleRate: Int, samples: Seq[Int], channels: Int = 1): Array[Byte] =
    Multimodal.encodeWav(sampleRate, channels, 16,
      samples.flatMap(le16).toArray)

  test("square wave: exact RMS, peak, mean, zero-crossings (all values binary-exact)") {
    // alternating +1000/-1000: |s| = 125/4096 exactly (1000/32768),
    // so rms == peak == 125/4096, mean == 0, crossings == n-1
    val n = 64
    val vals = (0 until n).map(i => if (i % 2 == 0) 1000 else -1000)
    val f = Multimodal.wavPcmFeatures(1L, wav16(8000, vals))
    assert(f.valid && f.bits_per_sample == 16 && f.channels == 1)
    assert(f.n_frames == n)
    assert(f.rms == 125.0 / 4096)
    assert(f.peak == 125.0 / 4096)
    assert(f.mean == 0.0)
    assert(f.zero_crossings == n - 1)
    assert(f.duration_ms == n * 1000L / 8000)
  }

  test("8-bit unsigned bias: 128→0, 0→-1, 255→127/128; 24/32-bit signed extremes hit ±1") {
    val w8 = Multimodal.encodeWav(8000, 1, 8, Array[Byte](128.toByte, 0, 255.toByte, 128.toByte))
    val f8 = Multimodal.wavPcmFeatures(1L, w8)
    assert(f8.valid && f8.peak == 1.0) // sample 0 → (0-128)/128 = -1
    assert(f8.mean == ((0.0 - 1.0 + 127.0 / 128 + 0.0) / 4))
    // crossing: -1 → +127/128 is one sign change
    assert(f8.zero_crossings == 1)

    // 24-bit: 0x800000 = -2^23 → -1.0 exactly; 0x7fffff → (2^23-1)/2^23
    val s24 = Array[Byte](0, 0, 0x80.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte)
    val f24 = Multimodal.wavPcmFeatures(2L, Multimodal.encodeWav(8000, 1, 24, s24))
    assert(f24.valid && f24.bits_per_sample == 24 && f24.n_frames == 2)
    assert(f24.peak == 1.0)
    assert(f24.zero_crossings == 1)

    // 32-bit: Int.MinValue → -1.0
    val s32 = Array[Byte](0, 0, 0, 0x80.toByte, 1, 0, 0, 0)
    val f32 = Multimodal.wavPcmFeatures(3L, Multimodal.encodeWav(8000, 1, 32, s32))
    assert(f32.valid && f32.bits_per_sample == 32 && f32.peak == 1.0)
  }

  test("stereo: interleaved frames, per-channel zero-crossings") {
    // L channel: +500, -500, +500, -500 (3 crossings)
    // R channel: +100, +100, +100, +100 (0 crossings)
    val inter = Seq(500, 100, -500, 100, 500, 100, -500, 100)
    val f = Multimodal.wavPcmFeatures(1L, wav16(16000, inter, channels = 2))
    assert(f.valid && f.channels == 2 && f.n_frames == 4)
    assert(f.zero_crossings == 3)
    assert(f.peak == 500.0 / 32768)
  }

  test("JDK AudioSystem decodes the same bytes to the same samples and features") {
    // deterministic pseudo-noise clip
    val vals = (0 until 500).map(i => ((i * 2654435761L + 99) % 20000L - 10000L).toInt)
    val bytes = wav16(22050, vals)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = ais.readAllBytes()
    assert(buf.length == vals.length * 2)
    // the JDK's frame payload re-parses to exactly the planted values
    val jdkRaw = buf.grouped(2).map(b =>
      ((b(0) & 0xff) | (b(1).toInt << 8)).toShort.toInt).toSeq
    assert(jdkRaw == vals)
    // features computed from the JDK's decode equal the engine's
    var sumSq = 0.0; var sum = 0.0; var peak = 0.0; var cross = 0L; var prev = 0
    jdkRaw.foreach { raw =>
      val s = raw / 32768.0
      sumSq += s * s; sum += s
      if (math.abs(s) > peak) peak = math.abs(s)
      val sg = Integer.signum(raw)
      if (sg != 0) { if (prev != 0 && sg != prev) cross += 1; prev = sg }
    }
    val f = Multimodal.wavPcmFeatures(1L, bytes)
    assert(f.rms == math.sqrt(sumSq / vals.length))
    assert(f.mean == sum / vals.length)
    assert(f.peak == peak)
    assert(f.zero_crossings == cross)
  }

  test("multi-data-chunk WAV: features and metadata agree on the SAME (last) chunk") {
    // hand-build RIFF with TWO data chunks — the decode and the
    // metadata walk must pick the same one or the feature row is
    // internally inconsistent (n_frames from one chunk, rms from another)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16v(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16v(1) ++ le16v(1) ++
      le32(8000) ++ le32(16000) ++ le16v(2) ++ le16v(16)
    val pcm1 = Seq(1000, -1000).flatMap(le16).toArray // 2 frames, quiet
    val pcm2 = Seq(30000, -30000, 30000, -30000).flatMap(le16).toArray // 4 frames, loud
    val d1 = "data".getBytes("US-ASCII") ++ le32(pcm1.length) ++ pcm1
    val d2 = "data".getBytes("US-ASCII") ++ le32(pcm2.length) ++ pcm2
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ d1 ++ d2
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val meta = Multimodal.wavMetadata(1L, wav)
    val f = Multimodal.wavPcmFeatures(1L, wav)
    assert(meta.valid && f.valid)
    assert(meta.n_samples == 4 && f.n_frames == 4) // the LAST chunk
    assert(f.peak == 30000.0 / 32768) // ...and the samples are from it too
    assert(f.zero_crossings == 3)
  }

  test("corrupt, non-PCM-width, and truncated inputs route through valid=false") {
    assert(!Multimodal.wavPcmFeatures(1L, Array[Byte](1, 2, 3)).valid)
    assert(!Multimodal.wavPcmFeatures(2L, "not audio at all".getBytes).valid)
    // 12-bit is not an integer-PCM layout this decoder supports —
    // must quarantine, not mis-parse
    val w12 = Multimodal.encodeWav(8000, 1, 12, Array.fill[Byte](30)(5))
    assert(!Multimodal.wavPcmFeatures(3L, w12).valid)
    // metadata-valid but zero-length data chunk
    val w0 = Multimodal.encodeWav(8000, 1, 16, Array.emptyByteArray)
    assert(!Multimodal.wavPcmFeatures(4L, w0).valid)
  }

  test("wavFeatures dataset path decodes per partition with quarantine accounting") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav16(8000, Seq(100, -100, 100, -100))),
      Multimodal.MediaRow(2L, "audio", "garbage".getBytes),
      Multimodal.MediaRow(3L, "audio", wav16(8000, Seq(3000, 3000))))
    val out = Multimodal.wavFeatures(rows.toDS().repartition(2))
      .collect().sortBy(_.media_id)
    assert(out.map(_.valid).toSeq == Seq(true, false, true))
    assert(out(0).zero_crossings == 3)
    assert(out(2).rms == 3000.0 / 32768)
  }

  test("wavEmbeddings: band envelope is real (silence vs signal) and feeds EmbeddingSearch end to end") {
    // envelope clips: A = loud then quiet, B = quiet then loud,
    // A2 = A with slightly different level — nearest neighbor of A2
    // must be A, not B
    def clip(loudFirst: Boolean, amp: Int): Seq[Int] =
      (0 until 800).map { i =>
        val loud = if (i < 400) loudFirst else !loudFirst
        val a = if (loud) amp else amp / 100
        if (i % 2 == 0) a else -a
      }
    val rows = Seq(
      Multimodal.MediaRow(10L, "audio", wav16(8000, clip(loudFirst = true, 20000))),
      Multimodal.MediaRow(11L, "audio", wav16(8000, clip(loudFirst = false, 20000))),
      Multimodal.MediaRow(12L, "audio", wav16(8000, clip(loudFirst = true, 15000))),
      Multimodal.MediaRow(13L, "audio", wav16(8000, clip(loudFirst = false, 12000))))
    val emb = Multimodal.wavEmbeddings(rows.toDS(), dim = 8)
    val collected = emb.collect().sortBy(_.media_id)
    assert(collected.length == 4)
    // clip 10: first 4 bands loud, last 4 near-silent
    val a = collected.head.features
    assert(a.take(4).forall(_ > 0.1f), a.mkString(","))
    assert(a.drop(4).forall(b => b < 0.05f && b > 0f), a.mkString(","))

    val df = emb.toDF().select($"media_id", $"features")
    val q = df.filter($"media_id" === 12L)
      .select($"media_id".as("qid"), $"features".as("qvec"))
    val top = EmbeddingSearch.bruteForceTopK(df, "media_id", "features",
      q, "qid", "qvec", k = 1)
      .select("neighbor_id").as[Long].head()
    assert(top == 10L, s"nearest clip to 12 (loud-first) should be 10, got $top")
  }
}
