package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Archive-container walks — TAR (POSIX ustar) and ZIP central
  * directory — the packaging layer a training-data pipeline meets
  * before any document format: dataset dumps, code corpora and web
  * archives ship as tar/zip, and curation routes on the MEMBER
  * listing (names, sizes, timestamps, compression method) long
  * before it extracts a byte. Both walks are pure-JVM byte walks in
  * the [[Multimodal]] container discipline: exact fields from the
  * public formats, every offset bound checked in Long arithmetic
  * (the wrapped-offset class), malformed structure yields NO rows —
  * never a guess — and CRCs are read as metadata, not verified
  * (listing, not extraction).
  *
  * Reference behavioral scope: the reference pipeline
  * (`load_hhs.py:30-40`) reads plain CSVs off disk; archive walks are
  * part of the 100 TB extension surface (SURVEY §2.8), not a
  * reference port.
  */
object Archive {

  // ---- TAR (POSIX ustar, the public tar(5) layout) --------------------

  final case class TarEntry(media_id: Long, entry_idx: Long, name: String,
                            size: Long, mtime: Long, type_flag: String,
                            checksum_ok: Boolean)

  /** Walk a ustar stream's 512-byte header blocks: one row per
    * member with name (prefix-joined), octal size/mtime, typeflag,
    * and whether the header checksum verifies (sum of header bytes
    * with the checksum field read as spaces). Data blocks are hopped
    * by size rounded to block; the walk ends at the two-zero-block
    * terminator, at a short read, or at a header whose magic is not
    * ustar. A member whose data would overrun the buffer invalidates
    * the stream (no rows) — a listing that silently truncates reads
    * as complete, which is the one wrong answer.
    */
  def tarEntries(id: Long, bytes: Array[Byte]): Seq[TarEntry] = {
    val n = bytes.length
    def octal(o: Int, len: Int): Long = {
      var v = 0L
      var i = o
      val end = o + len
      // skip leading spaces/NULs, read octal digits, stop at the pad
      while (i < end && (bytes(i) == ' ' || bytes(i) == 0)) i += 1
      while (i < end && bytes(i) >= '0' && bytes(i) <= '7') {
        v = v * 8 + (bytes(i) - '0'); i += 1
      }
      v
    }
    def cstr(o: Int, len: Int): String = {
      var e = o
      while (e < o + len && bytes(e) != 0) e += 1
      new String(bytes, o, e - o, "ISO-8859-1")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var off = 0
    var idx = 0L
    var walking = true
    while (walking) {
      if (off.toLong + 512 > n) walking = false // short read: end
      else if ((0 until 512).forall(i => bytes(off + i) == 0)) walking = false
      else {
        // accept BOTH magics (ADVICE r16): POSIX "ustar\0" reads as
        // "ustar" (NUL-terminated), old-GNU "ustar  \0" (space-
        // terminated magic) reads as "ustar " — a large share of
        // real-world tarballs carry the old-GNU form with an
        // identical header layout
        val magic = cstr(off + 257, 6)
        if (magic != "ustar" && magic != "ustar ") return Seq.empty
        val size = octal(off + 124, 12)
        val stored = octal(off + 148, 8)
        var sum = 0L
        (0 until 512).foreach { i =>
          sum += (if (i >= 148 && i < 156) ' '.toLong
                  else bytes(off + i) & 0xffL)
        }
        val prefix = cstr(off + 345, 155)
        val name0 = cstr(off, 100)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        val tf = (bytes(off + 156) & 0xff).toChar match {
          case 0 | '0' => "file"
          case '5' => "dir"
          case '2' => "symlink"
          case '1' => "hardlink"
          case c => c.toString
        }
        out += TarEntry(id, idx, name, size, octal(off + 136, 12), tf,
          checksum_ok = sum == stored)
        idx += 1
        val dataBlocks = (size + 511L) / 512L
        // Long bound: a crafted 11-digit octal size (up to 8 GiB-1)
        // must not wrap the offset
        val next = off.toLong + 512L + dataBlocks * 512L
        if (next > n) return Seq.empty // member overruns: invalid stream
        off = next.toInt
      }
    }
    out.toSeq
  }

  /** Test/data-gen helper: a REAL ustar stream — correct octal
    * fields, computed checksums, prefix splitting left to the caller
    * (names ≤ 100 bytes here), data padded to blocks, the
    * two-zero-block terminator. GNU/BSD tar both read the output.
    * Entries: (name, data, mtime, typeflag).
    */
  def encodeTar(entries: Seq[(String, Array[Byte], Long, Char)]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    entries.foreach { case (name, data, mtime, tf) =>
      val hdr = new Array[Byte](512)
      def put(o: Int, s: String): Unit = {
        val b = s.getBytes("ISO-8859-1")
        System.arraycopy(b, 0, hdr, o, math.min(b.length, 100))
      }
      def oct(o: Int, len: Int, v: Long): Unit =
        put(o, ("%0" + (len - 1) + "o").format(v))
      require(name.getBytes("ISO-8859-1").length <= 100)
      put(0, name)
      oct(100, 8, 420L) // 0644
      oct(108, 8, 0L); oct(116, 8, 0L)
      oct(124, 12, data.length.toLong)
      oct(136, 12, mtime)
      hdr(156) = tf.toByte
      put(257, "ustar"); hdr(262) = 0
      hdr(263) = '0'; hdr(264) = '0' // version "00"
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0L
      (0 until 512).foreach(i => sum += hdr(i) & 0xffL)
      // spec form: six octal digits, NUL, space
      val cs = "%06o".format(sum).getBytes("ISO-8859-1") ++
        Array[Byte](0, ' '.toByte)
      System.arraycopy(cs, 0, hdr, 148, 8)
      out ++= hdr
      out ++= data
      val pad = (512 - data.length % 512) % 512
      out ++= new Array[Byte](pad)
    }
    out ++= new Array[Byte](1024) // terminator
    out.toArray
  }

  // ---- ZIP central directory (the public APPNOTE.TXT layout) ----------

  final case class ZipEntry(media_id: Long, entry_idx: Long, name: String,
                            method: Int, compressed_size: Long,
                            uncompressed_size: Long, crc32: Long)

  /** Walk a ZIP's central directory: locate the end-of-central-
    * directory record by scanning backward for its signature (the
    * defined lookup — the comment field makes a fixed offset
    * impossible), then read each central-directory file header. The
    * LISTING is authoritative metadata in ZIP (local headers may use
    * data descriptors); name/method/sizes/CRC come straight from the
    * directory. Entry-count or size mismatches against the EOCD
    * record invalidate the archive (no rows).
    */
  def zipEntries(id: Long, bytes: Array[Byte]): Seq[ZipEntry] = {
    val n = bytes.length
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    // EOCD: 22 bytes + comment; scan back at most 64k+22
    var eocd = -1
    var p = n - 22
    val stop = math.max(0, n - 22 - 65535)
    while (eocd < 0 && p >= stop) {
      if (le32(p) == 0x06054b50L &&
          p.toLong + 22L + le16(p + 20) == n) eocd = p
      else p -= 1
    }
    if (eocd < 0) return Seq.empty
    val count = le16(eocd + 10)
    val cdSize = le32(eocd + 12)
    val cdOff = le32(eocd + 16)
    if (cdOff + cdSize > eocd.toLong) return Seq.empty // dir overruns EOCD
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
    var o = cdOff
    var i = 0
    while (i < count) {
      if (o + 46L > eocd) return Seq.empty
      val ob = o.toInt
      if (le32(ob) != 0x02014b50L) return Seq.empty
      val nameLen = le16(ob + 28)
      val extraLen = le16(ob + 30)
      val commentLen = le16(ob + 32)
      if (o + 46L + nameLen + extraLen + commentLen > eocd) return Seq.empty
      out += ZipEntry(id, i.toLong,
        new String(bytes, ob + 46, nameLen, "UTF-8"),
        le16(ob + 10), le32(ob + 20), le32(ob + 24), le32(ob + 16))
      o += 46L + nameLen + extraLen + commentLen
      i += 1
    }
    if (o != cdOff + cdSize) return Seq.empty // directory size mismatch
    out.toSeq
  }

  /** Test/data-gen helper: a REAL ZIP via the JDK's own writer —
    * STORED (method 0) for every third entry, DEFLATED otherwise, so
    * both methods appear in the central directory the walk reads.
    * Entries: (name, data, stored).
    */
  def encodeZip(entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, data, stored) =>
      val e = new java.util.zip.ZipEntry(name)
      if (stored) {
        e.setMethod(java.util.zip.ZipOutputStream.STORED)
        e.setSize(data.length.toLong)
        e.setCompressedSize(data.length.toLong)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        e.setCrc(crc.getValue)
      }
      zos.putNextEntry(e)
      zos.write(data)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Per-partition extraction faces — one row per archive member,
    * binary never leaves the executor (the [[Multimodal.decode]]
    * batch shape).
    */
  def tarTable(ds: Dataset[Multimodal.MediaRow]): DataFrame = {
    implicit val enc: Encoder[TarEntry] = Encoders.product[TarEntry]
    ds.mapPartitions(_.flatMap(r => tarEntries(r.media_id, r.content))).toDF()
  }

  def zipTable(ds: Dataset[Multimodal.MediaRow]): DataFrame = {
    implicit val enc: Encoder[ZipEntry] = Encoders.product[ZipEntry]
    ds.mapPartitions(_.flatMap(r => zipEntries(r.media_id, r.content))).toDF()
  }
}
