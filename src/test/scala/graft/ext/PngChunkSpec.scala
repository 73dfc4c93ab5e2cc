package graft.ext

import graft.SparkTestBase

/** PNG ancillary-chunk walk — exact assertions over real-format
  * bytes (the MultimodalContainerSpec pattern): provenance tEXt/iTXt
  * fields, pHYs density, chunk framing, and the JDK's own PNG reader
  * accepting the encoder's output (two independent parsers, one byte
  * stream — proof the encoder writes REAL PNG, CRCs included).
  */
class PngChunkSpec extends SparkTestBase {

  test("pngChunks: full ancillary set extracts exactly; ImageIO accepts the bytes") {
    val png = Multimodal.encodePngMeta(13, 7,
      texts = Seq(("Software", "graftpng 3"), ("Author", "author 1"),
        ("Title", "ignored-key")),
      itxts = Seq(("Comment", "fr", "café doc 42")),
      phys = Some((2835L, 1417L, 1)))
    val m = Multimodal.pngChunks(81L, png)
    assert(m == Multimodal.PngChunkMeta(81L, valid = true, 13L, 7L, 8, 2,
      // IHDR + 3 tEXt + iTXt + pHYs + IDAT + IEND
      8L, 2835L, 1417L, 1, "graftpng 3", "author 1", "fr", "café doc 42"))

    // the JDK's independent PNG reader decodes the same bytes to the
    // same geometry — the encoder's CRCs and IDAT are real
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 13 && img.getHeight == 7)
  }

  test("pngChunks: absent ancillary fields read empty/zero; first occurrence wins") {
    val bare = Multimodal.encodePngMeta(4, 4)
    val m = Multimodal.pngChunks(82L, bare)
    assert(m.valid && m.n_chunks == 3L && m.software == "" && m.ppu_x == 0L)
    val dup = Multimodal.encodePngMeta(4, 4,
      texts = Seq(("Software", "first"), ("Software", "second")))
    assert(Multimodal.pngChunks(83L, dup).software == "first")
  }

  test("pngChunks: ImageIO's own encoder output walks (sniff-compatible across writers)") {
    val jdk = Multimodal.encodePng(6, 5)((_, _) => 0x336699)
    val m = Multimodal.pngChunks(84L, jdk)
    assert(m.valid && m.width == 6L && m.height == 5L && m.bit_depth == 8)
  }

  test("pngChunks: malformed reads invalid, never a guess or a crash") {
    val png = Multimodal.encodePngMeta(4, 4, texts = Seq(("Software", "x")))
    // bad signature
    assert(!Multimodal.pngChunks(85L, "notapng".getBytes("US-ASCII")).valid)
    // truncation mid-chunk
    assert(!Multimodal.pngChunks(86L, png.take(20)).valid)
    // missing IEND: strip the final 12 bytes
    assert(!Multimodal.pngChunks(87L, png.dropRight(12)).valid)
    // first chunk not IHDR: corrupt the type tag
    val notFirst = png.clone(); notFirst(12) = 'X'
    assert(!Multimodal.pngChunks(88L, notFirst).valid)
    // crafted length near 2^31: the Long-arithmetic wrap guard — the
    // r16 ADVICE class; must read invalid, not index out of bounds
    val hostile = png.clone()
    hostile(8) = 0x7f; hostile(9) = 0xff.toByte
    hostile(10) = 0xff.toByte; hostile(11) = 0xf0.toByte
    assert(!Multimodal.pngChunks(89L, hostile).valid)
  }

  test("pngChunks: compressed iTXt is skipped, not guessed") {
    // hand-flip the compression flag byte inside the iTXt chunk
    val png = Multimodal.encodePngMeta(4, 4,
      itxts = Seq(("Comment", "en", "secret")))
    val idx = {
      val s = "iTXt".getBytes("US-ASCII")
      (0 until png.length - 4).indexWhere(i => png.slice(i, i + 4).sameElements(s))
    }
    // layout: type(4) + "Comment"(7) + NUL + cflag
    val flipped = png.clone(); flipped(idx + 4 + 7 + 1) = 1
    val m = Multimodal.pngChunks(90L, flipped)
    assert(m.valid && m.comment == "" && m.comment_lang == "")
  }

  test("pngChunks: trailing bytes after IEND read invalid (r16 ADVICE — IEND must close the stream)") {
    val png = Multimodal.encodePngMeta(4, 4)
    assert(Multimodal.pngChunks(90L, png).valid)
    assert(!Multimodal.pngChunks(91L,
      png ++ "polyglot tail".getBytes("US-ASCII")).valid)
    assert(!Multimodal.pngChunks(92L, png :+ 0.toByte).valid)
  }
}
