package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is carried as an opaque `binary` column plus typed metadata —
  * the layout a 100 TB training pipeline needs: the binary never leaves
  * the executor, decode/feature steps run per-partition, and metadata
  * (not pixels) drives partitioning and filtering.
  *
  * IMAGE decode is REAL: `decodeImages`/`imageThumbnails` use
  * JDK-native `javax.imageio` (PNG/JPEG/GIF/BMP — no external
  * dependency) for dimensions, mean-color features, and resized
  * thumbnails. Video/audio codec calls remain STUBBED (no such
  * libraries in the JDK): `decodeHeader` parses a deterministic
  * synthetic "GRFT" container header, and `resize`/`sampleFrames`
  * transform metadata and pass the payload through. The Spark-side
  * shape — schema, Dataset encoders, mapPartitions batching, explode
  * for frame sampling — is identical on both paths; swapping in
  * javacv/ffmpeg for video is a local change inside `decodeHeader`.
  *
  * Synthetic container layout (big-endian ints):
  *   bytes 0-3  magic "GRFT"
  *   bytes 4-7  width, 8-11 height, 12-15 frame count
  *   bytes 16+  payload
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nFrames: Int, valid: Boolean)
  final case class MediaRow(media_id: Long, media_type: String, content: Array[Byte])
  final case class DecodedRow(media_id: Long, media_type: String,
                              content: Array[Byte], meta: MediaMeta)

  implicit private val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit private val decodedEnc: Encoder[DecodedRow] = Encoders.product[DecodedRow]

  /** STUB codec boundary: header parse only. A real implementation
    * replaces the body (e.g. ImageIO/ffmpeg) without touching the
    * Spark plumbing around it.
    */
  def decodeHeader(bytes: Array[Byte]): MediaMeta = {
    def int(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    if (bytes.length >= 16 && bytes(0) == 'G' && bytes(1) == 'R' &&
        bytes(2) == 'F' && bytes(3) == 'T')
      MediaMeta(int(4), int(8), int(12), valid = true)
    else MediaMeta(0, 0, 0, valid = false)
  }

  /** Encode the synthetic container (test/data-gen helper). */
  def encode(width: Int, height: Int, nFrames: Int, payload: Array[Byte]): Array[Byte] = {
    def be(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    "GRFT".getBytes("UTF-8") ++ be(width) ++ be(height) ++ be(nFrames) ++ payload
  }

  /** Per-partition decode: binary → typed metadata. mapPartitions (not
    * per-row UDF) so a real codec can amortize native init per batch —
    * the Scala analogue of mapInPandas batch shape.
    */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedRow] =
    ds.mapPartitions { it =>
      // real impl: initialize the codec ONCE here, reuse across rows
      it.map(r => DecodedRow(r.media_id, r.media_type, r.content, decodeHeader(r.content)))
    }

  /** DataFrame-level decode keeping schema explicit for SQL users. */
  def withMetadata(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    decode(df.as[MediaRow]).toDF()
  }

  /** Frame sampling: one output row per sampled frame index (stride
    * sampling). The payload is NOT duplicated: frame rows carry ids +
    * indices; a downstream per-partition decode fetches pixels. This is
    * the join-back-later layout that keeps the shuffle narrow at scale.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .filter(col("meta.valid") && col("meta.nFrames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.nFrames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stub: metadata transform, payload passthrough (a real
    * implementation rewrites content in the same mapPartitions pass).
    */
  def resize(decoded: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide).cast("double") / greatest(w, h, lit(1)))
    decoded
      .withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }

  final case class FeatureRow(media_id: Long, features: Array[Float])

  /** Feature extraction: binary payload → fixed-width float vector, per
    * partition (codec init amortized across the batch, same shape as
    * decode). The STUB computes a 16-bin byte histogram of the payload,
    * L1-normalized — deterministic and shaped exactly like a real
    * embedding, so the output feeds EmbeddingSearch directly (tested:
    * media → features → cosine top-k end to end). A real extractor
    * replaces the histogram with a model forward pass.
    */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[FeatureRow] = {
    implicit val enc: Encoder[FeatureRow] = Encoders.product[FeatureRow]
    ds.mapPartitions { it =>
      // real impl: load the feature model ONCE per partition here
      it.map { r =>
        val meta = decodeHeader(r.content)
        val payload = if (meta.valid) r.content.drop(16) else r.content
        val hist = new Array[Float](dim)
        payload.foreach(b => hist((b & 0xff) % dim) += 1f)
        val total = math.max(payload.length, 1).toFloat
        var i = 0
        while (i < dim) { hist(i) /= total; i += 1 }
        FeatureRow(r.media_id, hist)
      }
    }
  }

  final case class AudioStats(media_id: Long, n_samples: Int, rms: Double, peak: Int)

  /** Audio stats stub: treat the payload as signed 8-bit PCM samples
    * and compute RMS + peak per row, per partition (same batch shape as
    * decode — a real implementation swaps in an audio decoder and
    * computes over real samples). Demonstrates the audio face of the
    * multimodal plumbing: binary in, typed acoustic features out,
    * nothing but metadata crosses a shuffle.
    */
  def audioStats(ds: Dataset[MediaRow]): Dataset[AudioStats] = {
    implicit val enc: Encoder[AudioStats] = Encoders.product[AudioStats]
    ds.mapPartitions { it =>
      it.map { r =>
        val meta = decodeHeader(r.content)
        val samples = if (meta.valid) r.content.drop(16) else r.content
        var sumSq = 0.0
        var peak = 0
        samples.foreach { b =>
          val v = b.toInt
          sumSq += v.toDouble * v
          if (math.abs(v) > peak) peak = math.abs(v)
        }
        val n = math.max(samples.length, 1)
        AudioStats(r.media_id, samples.length, math.sqrt(sumSq / n), peak)
      }
    }
  }

  // ---------------------------------------------------------------------
  // REAL image decode — JDK-native javax.imageio (PNG/JPEG/GIF/BMP), no
  // external dependency. This replaces the stub codec for the image
  // modality; video/audio keep the synthetic-container stubs (no codec
  // libraries in the JDK). Same plumbing discipline: binary stays on
  // the executor, mapPartitions batches, typed metadata out.
  // ---------------------------------------------------------------------

  final case class ImageMeta(media_id: Long, valid: Boolean, format: String,
                             width: Int, height: Int,
                             mean_r: Double, mean_g: Double, mean_b: Double)

  /** Container format sniffed from magic bytes — cheap, no decode. */
  def imageFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else "unknown"

  /** Decode one image: dimensions + mean RGB. Returns valid=false (all
    * zeros) on undecodable bytes — corrupt media must never kill a
    * 100 TB ingest (same contract as the CSV/JSONL quarantine paths).
    */
  def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
    val fmt = imageFormat(bytes)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) ImageMeta(id, valid = false, fmt, 0, 0, 0, 0, 0)
      else {
        val w = img.getWidth; val h = img.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = math.max(w.toLong * h, 1L).toDouble
        ImageMeta(id, valid = true, fmt, w, h, r / n, g / n, b / n)
      }
    } catch { case _: Exception => ImageMeta(id, valid = false, fmt, 0, 0, 0, 0, 0) }
  }

  /** Per-partition REAL decode: binary → dimensions + mean-color
    * features. ImageIO's disk cache is disabled once per partition
    * (per-image tmp-file spooling would thrash executor-local disk at
    * ingest scale; heap buffers are the right trade for thumbnails and
    * metadata).
    */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[ImageMeta] = {
    implicit val enc: Encoder[ImageMeta] = Encoders.product[ImageMeta]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(r => decodeImage(r.media_id, r.content))
    }
  }

  /** Real thumbnail: decode, scale so max(side) == maxSide (never
    * upscale), re-encode PNG. Output rows carry the resized payload +
    * new dimensions; undecodable inputs are dropped (route them via
    * [[decodeImages]].valid for quarantine accounting).
    */
  final case class ThumbRow(media_id: Long, width: Int, height: Int, content: Array[Byte])

  def imageThumbnails(ds: Dataset[MediaRow], maxSide: Int): Dataset[ThumbRow] = {
    require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")
    implicit val enc: Encoder[ThumbRow] = Encoders.product[ThumbRow]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
          if (img == null) None
          else {
            val scale = math.min(1.0, maxSide.toDouble / math.max(math.max(img.getWidth, img.getHeight), 1))
            val w = math.max((img.getWidth * scale).toInt, 1)
            val h = math.max((img.getHeight * scale).toInt, 1)
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val gfx = out.createGraphics()
            gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            gfx.drawImage(img, 0, 0, w, h, null)
            gfx.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(ThumbRow(r.media_id, w, h, bos.toByteArray))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  /** Test/data-gen helper: a real PNG with a pixel function. */
  def encodePng(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic media table (no binary testdata table
    * exists; generation is seeded by media_id so plans are reproducible).
    */
  def syntheticTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val w = 64 + (i % 16).toInt * 32
      val h = 64 + (i % 9).toInt * 48
      val frames = 1 + (i % 30).toInt
      val payload = Array.tabulate((i % 64).toInt + 16)(j => ((i * 31 + j) % 251).toByte)
      MediaRow(i, if (i % 3 == 0) "video" else "image", encode(w, h, frames, payload))
    }
  }
}
