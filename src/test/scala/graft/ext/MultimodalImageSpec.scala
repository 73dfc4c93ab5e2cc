package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** REAL image decode via javax.imageio: checked-in-equivalent fixture
  * bytes (deterministic in-test PNG/JPEG encodes) with exactly-asserted
  * decoded metadata.
  */
class MultimodalImageSpec extends SparkTestBase {

  import spark.implicits._

  private def jpegBytes(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("decodeImages: real PNG bytes decode to exact dimensions and mean color") {
    // left half pure red, right half pure blue → mean is exactly half each
    val png = Multimodal.encodePng(8, 4)((x, _) => if (x < 4) 0xff0000 else 0x0000ff)
    val media = Seq(Multimodal.MediaRow(1L, "image", png)).toDS()
    val m = Multimodal.decodeImages(media).head()
    assert(m.valid && m.format == "png")
    assert(m.width == 8 && m.height == 4)
    assert(m.mean_r == 127.5 && m.mean_g == 0.0 && m.mean_b == 127.5)
  }

  test("decodeImages: JPEG decodes with correct dimensions and near-exact color") {
    val jpg = jpegBytes(16, 9, 0x00ff00) // solid green, lossy codec
    val m = Multimodal.decodeImages(Seq(Multimodal.MediaRow(2L, "image", jpg)).toDS()).head()
    assert(m.valid && m.format == "jpeg")
    assert(m.width == 16 && m.height == 9)
    assert(m.mean_g > 240 && m.mean_r < 40 && m.mean_b < 40,
      s"solid green JPEG decoded to rgb=(${m.mean_r}, ${m.mean_g}, ${m.mean_b})")
  }

  test("decodeImages: undecodable bytes yield valid=false, never an exception") {
    val junk = Seq(
      Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRow(4L, "image", Array.empty[Byte]),
      // PNG magic with garbage body: format sniffs png, decode fails
      Multimodal.MediaRow(5L, "image",
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 9, 9, 9))).toDS()
    val out = Multimodal.decodeImages(junk).collect().sortBy(_.media_id)
    assert(out.forall(!_.valid))
    assert(out.map(_.format).toSeq == Seq("unknown", "unknown", "png"))
    assert(out.forall(m => m.width == 0 && m.height == 0))
  }

  test("imageThumbnails: aspect-preserving downscale, re-decodable PNG output, no upscale") {
    val wide = Multimodal.encodePng(100, 50)((_, _) => 0xffffff)
    val tiny = Multimodal.encodePng(4, 3)((_, _) => 0x000000)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", wide),
      Multimodal.MediaRow(2L, "image", tiny),
      Multimodal.MediaRow(3L, "image", Array[Byte](9, 9, 9))).toDS()
    val thumbs = Multimodal.imageThumbnails(media, maxSide = 10)
      .collect().sortBy(_.media_id)
    assert(thumbs.map(_.media_id).toSeq == Seq(1L, 2L), "undecodable row dropped")
    assert(thumbs(0).width == 10 && thumbs(0).height == 5, "100x50 → 10x5")
    assert(thumbs(1).width == 4 && thumbs(1).height == 3, "small images never upscale")
    // the thumbnail payload is a REAL png: decode it back and check
    val roundTrip = Multimodal.decodeImage(1L, thumbs(0).content)
    assert(roundTrip.valid && roundTrip.format == "png")
    assert(roundTrip.width == 10 && roundTrip.height == 5)
    assert(roundTrip.mean_r == 255.0 && roundTrip.mean_g == 255.0 && roundTrip.mean_b == 255.0)
  }

  test("real image mean-color features feed embedding search end-to-end") {
    // two red-ish, two blue-ish, one green image — real PNG bytes
    val media = Seq(
      (1L, 0xff0000), (2L, 0xee1010), // red pair
      (3L, 0x0000ff), (4L, 0x1010ee), // blue pair
      (5L, 0x00ff00)).map { case (id, rgb) =>
      Multimodal.MediaRow(id, "image", Multimodal.encodePng(6, 6)((_, _) => rgb))
    }.toDS()
    val feats = Multimodal.decodeImages(media).toDF()
      .filter($"valid")
      .select($"media_id",
        array($"mean_r".cast("float"), $"mean_g".cast("float"),
          $"mean_b".cast("float")).as("embedding"))
    val queries = feats.filter($"media_id" === 1L)
      .select($"media_id".as("qid"), $"embedding".as("qvec"))
    val nn = EmbeddingSearch.bruteForceTopK(feats, "media_id", "embedding",
        queries, "qid", "qvec", k = 1)
      .select("neighbor_id").as[Long].head()
    assert(nn == 2L, s"nearest neighbor of the red image must be the other red, got $nn")
  }

  test("decode composes with the DataFrame layer: filter/aggregate on decoded metadata") {
    val rows = (1 to 20).map { i =>
      Multimodal.MediaRow(i.toLong, "image",
        Multimodal.encodePng(10 * i, 5)((_, _) => 0x102030))
    }
    val meta = Multimodal.decodeImages(rows.toDS()).toDF()
    val big = meta.filter($"width" >= 100)
      .agg(count(lit(1)).as("n"), max($"width").as("mx"))
      .as[(Long, Int)].head()
    assert(big == ((11L, 200)))
    // exact mean color survives the scan: 0x10=16, 0x20=32, 0x30=48
    val colors = meta.select($"mean_r", $"mean_g", $"mean_b").distinct()
      .as[(Double, Double, Double)].collect().toSeq
    assert(colors == Seq((16.0, 32.0, 48.0)))
  }

  private def gradientPng(seed: Int, w: Int = 90, h: Int = 80,
                          shift: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // structured, seed-dependent luminance field; +shift is a
      // uniform brightness change (kept clip-free: values stay <= 245)
      val v = ((x * 7 + y * 13 + seed * 37 + (x * y) % 31) % 200) + shift
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def dhashOf(rows: (Long, Array[Byte])*): Map[Long, (Boolean, Long)] =
    Multimodal.imageDHash(
      rows.map { case (id, b) => Multimodal.MediaRow(id, "image", b) }.toDS())
      .collect().map(r => r.media_id -> (r.valid, r.dhash)).toMap

  test("imageDHash: re-encode and uniform brightness shift keep the hash; edits move it a little; unrelated images far") {
    val base = gradientPng(seed = 1)
    val reEncoded = {
      // decode + re-encode round trip (PNG is lossless -> same pixels)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val brighter = gradientPng(seed = 1, shift = 10)
    val edited = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
      for (y <- 0 until 30; x <- 0 until 30) img.setRGB(x, y, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val other = gradientPng(seed = 9)
    val hs = dhashOf(1L -> base, 2L -> reEncoded, 3L -> brighter,
      4L -> edited, 5L -> other)
    assert(hs.values.forall(_._1), "all inputs decodable")
    def dist(a: Long, b: Long) =
      java.lang.Long.bitCount(hs(a)._2 ^ hs(b)._2)
    assert(dist(1L, 2L) == 0, "lossless re-encode must not move the hash")
    assert(dist(1L, 3L) == 0, "uniform brightness shift preserves gradient signs")
    assert(dist(1L, 4L) > 0 && dist(1L, 4L) <= 12, s"small edit small move: ${dist(1L, 4L)}")
    assert(dist(1L, 5L) >= 16, s"unrelated images far apart: ${dist(1L, 5L)}")
  }

  test("imageDHash: undecodable bytes and sub-grid images yield valid=false, never an exception") {
    val tiny = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val hs = dhashOf(7L -> Array[Byte](1, 2, 3, 4), 8L -> tiny)
    assert(hs(7L) == (false, 0L))
    // decodable but narrower than the 9-wide grid: explicitly invalid,
    // not a swallowed divide-by-zero
    assert(hs(8L) == (false, 0L))
  }

  test("dHashNearDupPairs on real pixels: planted near-dup found, unrelated rejected, pigeonhole holds") {
    val base = gradientPng(seed = 4)
    val nearDup = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
      for (y <- 0 until 6; x <- 0 until 6) img.setRGB(x, y, 0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(1L -> base, 2L -> nearDup, 3L -> gradientPng(seed = 11),
      4L -> gradientPng(seed = 23))
    val hashes = Multimodal.imageDHash(
      rows.map { case (id, b) => Multimodal.MediaRow(id, "image", b) }.toDS()).toDF()
    val pairs = Multimodal.dHashNearDupPairs(hashes, "media_id", "dhash",
        bands = 4, maxDist = 6)
      .select($"id1", $"id2", $"dist").as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"exactly the planted pair: $pairs")
    assert(pairs.head._3 <= 3, "dist < bands -> pigeonhole guaranteed the catch")
  }
}
