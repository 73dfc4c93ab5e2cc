package graft.ext

import graft.SparkTestBase
import java.awt.image.BufferedImage

/** REAL video frame decode on real bytes: animated GIF (JDK multi-frame
  * reader) and MJPEG-in-AVI (RIFF walk + ImageIO JPEG codec) — exact
  * frame counts and dimensions, mean-color fidelity, stride sampling,
  * the documented H.264 zero-row stub contract, AVI container
  * metadata, and frame embeddings flowing into EmbeddingSearch.
  */
class MultimodalVideoSpec extends SparkTestBase {

  import spark.implicits._

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(new java.awt.Color(r, g, b))
    gfx.fillRect(0, 0, w, h)
    gfx.dispose()
    img
  }

  private val palette = Seq((200, 0, 0), (0, 200, 0), (0, 0, 200), (100, 100, 100), (250, 250, 250))

  test("animated GIF: exact frame count, dims, per-frame colors, stride sampling") {
    val frames = palette.map { case (r, g, b) => solid(40, 24, r, g, b) }
    val gif = Multimodal.encodeGifAnimated(frames)
    val out = Multimodal.gifFrames(7L, gif)
    assert(out.map(_.frame_idx) == Seq(0, 1, 2, 3, 4))
    assert(out.forall(f => f.width == 40 && f.height == 24))
    out.zip(palette).foreach { case (f, (r, g, b)) =>
      assert(math.abs(f.mean_r - r) <= 2 && math.abs(f.mean_g - g) <= 2 &&
        math.abs(f.mean_b - b) <= 2, s"frame ${f.frame_idx}: $f vs ($r,$g,$b)")
    }
    assert(Multimodal.gifFrames(7L, gif, stride = 2).map(_.frame_idx) == Seq(0, 2, 4))
    // single-frame (non-animated) GIFs are just 1-frame videos
    val still = Multimodal.encodeGifAnimated(Seq(solid(8, 8, 0, 200, 0)))
    assert(Multimodal.gifFrames(1L, still).size == 1)
  }

  test("MJPEG-in-AVI: exact frame count, dims, colors within JPEG tolerance; avih metadata") {
    val frames = palette.take(4).map { case (r, g, b) => solid(32, 16, r, g, b) }
    val avi = Multimodal.encodeAviMjpeg(32, 16, usPerFrame = 40000, frames)
    assert(Multimodal.isAvi(avi))
    val out = Multimodal.aviMjpegFrames(9L, avi)
    assert(out.map(_.frame_idx) == Seq(0, 1, 2, 3))
    assert(out.forall(f => f.width == 32 && f.height == 16))
    out.zip(palette).foreach { case (f, (r, g, b)) =>
      assert(math.abs(f.mean_r - r) <= 4 && math.abs(f.mean_g - g) <= 4 &&
        math.abs(f.mean_b - b) <= 4, s"frame ${f.frame_idx}: $f vs ($r,$g,$b)")
    }
    assert(Multimodal.aviMjpegFrames(9L, avi, stride = 3).map(_.frame_idx) == Seq(0, 3))

    val meta = Multimodal.aviMetadata(9L, avi)
    assert(meta.valid && meta.container == "avi")
    assert(meta.n_samples == 4)            // frames
    assert(meta.sample_rate == 25)         // 1e6 / 40000 µs
    assert(meta.duration_ms == 160)        // 4 × 40 ms
    assert(meta.n_tracks == 1)
  }

  test("videoFrames dispatch: GIF and AVI decode; MP4/H.264 and junk yield zero rows by contract") {
    val gif = Multimodal.encodeGifAnimated(palette.take(3).map { case (r, g, b) => solid(16, 16, r, g, b) })
    val avi = Multimodal.encodeAviMjpeg(16, 16, 33333,
      palette.take(2).map { case (r, g, b) => solid(16, 16, r, g, b) })
    val mp4 = Multimodal.encodeMp4(1000, 5000, nTracks = 1,
      trackDims = Seq((5000, 640, 360)))
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", gif),
      Multimodal.MediaRow(2L, "video", avi),
      Multimodal.MediaRow(3L, "video", mp4),
      Multimodal.MediaRow(4L, "video", Array[Byte](1, 2, 3, 4))).toDS()
    val got = Multimodal.videoFrames(rows).collect()
      .groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(got == Map(1L -> 3, 2L -> 2))
    // the H.264-shaped file still gets metadata-level curation
    val metas = Multimodal.containerMetadata(rows).collect()
      .map(m => m.media_id -> m.container).toMap
    assert(metas(2L) == "avi" && metas(3L) == "mp4")
    // an AVI whose video chunks hold non-JPEG payloads (H.264 NALs in
    // a '00dc' chunk) is skipped per chunk, not mis-decoded
    val fakeFrames = Multimodal.encodeAviMjpeg(8, 8, 40000, Seq(solid(8, 8, 1, 2, 3)))
    // corrupt the JPEG magic inside the single 00dc chunk
    val idx = fakeFrames.indexOfSlice("00dc".getBytes("US-ASCII"))
    fakeFrames(idx + 8) = 0x00
    assert(Multimodal.aviMjpegFrames(5L, fakeFrames).isEmpty)
  }

  test("frame embeddings feed EmbeddingSearch end to end: duplicate frames found by cosine") {
    // two media share an identical middle frame; the embedding path
    // must surface that pair as the top cosine hit
    val a = Multimodal.encodeGifAnimated(Seq(
      solid(24, 24, 200, 0, 0), solid(24, 24, 10, 250, 10), solid(24, 24, 0, 0, 200)))
    val b = Multimodal.encodeGifAnimated(Seq(
      solid(24, 24, 250, 250, 250), solid(24, 24, 10, 250, 10)))
    val rows = Seq(Multimodal.MediaRow(1L, "video", a),
      Multimodal.MediaRow(2L, "video", b)).toDS()
    val emb = Multimodal.videoFrameEmbeddings(rows, stride = 1, dim = 16)
      .toDF()
      .select(($"media_id" * 100 + $"frame_idx").as("fid"), $"features")
    // L1 normalization: every histogram sums to 1
    val sums = emb.select(org.apache.spark.sql.functions.aggregate(
      $"features", org.apache.spark.sql.functions.lit(0.0d),
      (acc, x) => acc + x).as("s")).as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-5))
    val q = emb.filter($"fid" === 101L).select($"fid".as("qid"), $"features".as("qvec"))
    val top = EmbeddingSearch.bruteForceTopK(emb, "fid", "features",
      q, "qid", "qvec", k = 1)
    val hit = top.select("neighbor_id").as[Long].head()
    assert(hit == 201L, s"identical frame 201 should be the top hit, got $hit")
  }
}
