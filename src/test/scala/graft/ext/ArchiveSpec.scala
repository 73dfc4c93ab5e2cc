package graft.ext

import graft.SparkTestBase

/** TAR/ZIP archive walks — exact assertions over real-format bytes,
  * cross-checked against the JDK's own ZIP reader (two independent
  * parsers, one byte stream) and pinned on malformed shapes.
  */
class ArchiveSpec extends SparkTestBase {

  test("tarEntries: ustar members walk back exactly, checksums verify") {
    val tar = Archive.encodeTar(Seq(
      ("data/", Array.emptyByteArray, 1700000000L, '5'),
      ("data/a.txt", "hello tar".getBytes("US-ASCII"), 1700000060L, '0'),
      ("data/b.bin", Array.tabulate[Byte](700)(_.toByte), 1700000120L, '0')))
    val es = Archive.tarEntries(101L, tar)
    assert(es == Seq(
      Archive.TarEntry(101L, 0L, "data/", 0L, 1700000000L, "dir", true),
      Archive.TarEntry(101L, 1L, "data/a.txt", 9L, 1700000060L, "file", true),
      Archive.TarEntry(101L, 2L, "data/b.bin", 700L, 1700000120L, "file", true)))
  }

  test("tarEntries: corrupted checksum reads checksum_ok=false, not a dropped row") {
    val tar = Archive.encodeTar(Seq(
      ("x.txt", "x".getBytes("US-ASCII"), 1L, '0')))
    val bad = tar.clone(); bad(0) = 'y' // name change breaks the sum
    val es = Archive.tarEntries(102L, bad)
    assert(es.size == 1 && es.head.name == "y.txt" && !es.head.checksum_ok)
  }

  test("tarEntries: malformed yields no rows, never a guess") {
    val tar = Archive.encodeTar(Seq(
      ("a.txt", "abc".getBytes("US-ASCII"), 1L, '0')))
    // not ustar
    assert(Archive.tarEntries(103L, "plain prose, no headers here padded"
      .getBytes("US-ASCII").padTo(1024, 0.toByte)).isEmpty)
    // member data overruns the buffer: crafted 8 GiB-1 octal size —
    // the Long-bound guard (the wrapped-offset class)
    val huge = tar.clone()
    "77777777777".getBytes("US-ASCII").copyToArray(huge, 124)
    assert(Archive.tarEntries(104L, huge).isEmpty)
  }

  test("zipEntries: central directory walks back exactly; JDK reader agrees") {
    val data = Seq(
      ("doc/f0.txt", "stored content here".getBytes("US-ASCII"), true),
      ("doc/f1.txt", "deflate me ".repeat(20).getBytes("US-ASCII"), false))
    val zip = Archive.encodeZip(data)
    val es = Archive.zipEntries(105L, zip)
    assert(es.map(e => (e.name, e.method, e.uncompressed_size)) == Seq(
      ("doc/f0.txt", 0, 19L), ("doc/f1.txt", 8, 220L)))
    // the walk's CRC matches the JDK's own computation per member
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    data.indices.foreach { i =>
      val e = zin.getNextEntry
      val buf = new Array[Byte](4096)
      val crc = new java.util.zip.CRC32()
      var r = zin.read(buf)
      while (r > 0) { crc.update(buf, 0, r); r = zin.read(buf) }
      assert(e.getName == es(i).name && crc.getValue == es(i).crc32)
    }
  }

  test("zipEntries: a trailing comment still locates the EOCD; malformed reads empty") {
    val zip = Archive.encodeZip(Seq(("a", "b".getBytes("US-ASCII"), true)))
    // ZipOutputStream writes no comment; append one by patching the
    // EOCD comment-length field and adding bytes
    val withComment = zip.dropRight(2) ++
      Array[Byte](7, 0) ++ "comment".getBytes("US-ASCII")
    assert(Archive.zipEntries(106L, withComment).size == 1)
    // truncation loses the EOCD
    assert(Archive.zipEntries(107L, zip.dropRight(5)).isEmpty)
    // an EOCD claiming more entries than the directory holds
    val overCount = zip.clone()
    overCount(zip.length - 12) = 9 // total-entries field (LE16 low byte)
    assert(Archive.zipEntries(108L, overCount).isEmpty)
  }

  test("tarEntries: old-GNU space-terminated magic is accepted (r16 ADVICE)") {
    val tar = Archive.encodeTar(Seq(
      ("g.txt", "gnu".getBytes("US-ASCII"), 3L, '0')))
    // rewrite magic+version "ustar\u000000" -> old-GNU "ustar  \u0000"
    val gnu = tar.clone()
    "ustar ".getBytes("ISO-8859-1").copyToArray(gnu, 257)
    gnu(263) = ' '; gnu(264) = 0
    val es = Archive.tarEntries(110L, gnu)
    assert(es.size == 1 && es.head.name == "g.txt" && es.head.size == 3L)
    // the header checksum covers the rewritten bytes, so it reads
    // stale — the row must still appear with checksum_ok = false
    assert(!es.head.checksum_ok)
  }
}
