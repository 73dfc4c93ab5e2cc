package graft.ext

import graft.SparkTestBase

/** Pins the SRT/WebVTT cue walks on hand-built documents — CRLF
  * endings, explicit vs running indices, hourless VTT stamps, cue
  * settings after the end stamp, NOTE-block skipping, the
  * malformed-block-ends-the-walk contract — and the caption-quality
  * screen's hand-computed stats.
  */
class SubtitlesSpec extends SparkTestBase {

  import spark.implicits._

  test("parseSrt: exact millisecond decode, CRLF, explicit indices, multi-line text") {
    val srt = "1\r\n00:00:01,500 --> 00:00:03,250\r\nhello there\r\nsecond line\r\n\r\n" +
      "7\r\n01:02:03,004 --> 01:02:04,000\r\nnext\r\n"
    val cues = Subtitles.parseSrt(5L, srt)
    assert(cues == Seq(
      Subtitles.Cue(5L, 1L, 1500L, 3250L, "hello there\nsecond line"),
      Subtitles.Cue(5L, 7L, 3723004L, 3724000L, "next")))
  }

  test("parseSrt: a malformed block ends the walk, cues before it survive") {
    val srt = "1\n00:00:00,000 --> 00:00:01,000\nok\n\n" +
      "2\n00:00:02,000 -> 00:00:03,000\nbad arrow\n\n" + // not a time line
      "3\n00:00:04,000 --> 00:00:05,000\nnever reached"
    val cues = Subtitles.parseSrt(1L, srt)
    assert(cues.map(_.text) == Seq("ok"))
    // end-before-start is malformed too
    assert(Subtitles.parseSrt(2L,
      "1\n00:00:05,000 --> 00:00:04,000\nbackwards").isEmpty)
    // dot milliseconds are the VTT form, not SRT's
    assert(Subtitles.parseSrt(3L,
      "1\n00:00:01.000 --> 00:00:02.000\nwrong sep").isEmpty)
  }

  test("parseVtt: magic required, NOTE skipped, hourless stamps, cue settings, running indices") {
    val vtt = "WEBVTT\n\nNOTE a comment block\nstill the comment\n\n" +
      "intro-cue\n00:05.000 --> 00:07.500 align:start line:0\nshort form\n\n" +
      "01:00:00.250 --> 01:00:01.000\nlong form"
    val cues = Subtitles.parseVtt(9L, vtt)
    assert(cues == Seq(
      Subtitles.Cue(9L, 1L, 5000L, 7500L, "short form"),
      Subtitles.Cue(9L, 2L, 3600250L, 3601000L, "long form")))
    // no magic → no cues
    assert(Subtitles.parseVtt(9L, "00:05.000 --> 00:07.500\nx").isEmpty)
    // comma milliseconds are SRT's form, not VTT's
    assert(Subtitles.parseVtt(9L,
      "WEBVTT\n\n00:00:01,000 --> 00:00:02,000\nwrong sep").isEmpty)
  }

  test("cueTable routes formats per row; binary/text stays on executors") {
    val ds = Seq(
      (1L, "srt", "1\n00:00:00,000 --> 00:00:01,000\na"),
      (2L, "vtt", "WEBVTT\n\n00:00.500 --> 00:01.000\nb")).toDS()
    val rows = Subtitles.cueTable(ds).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    assert(rows == Set((1L, 0L, 1000L, "a"), (2L, 500L, 1000L, "b")))
  }

  test("cueStats: hand-computed span/talk/overlaps and the integer reading-speed flag") {
    // doc 1: two cues, second starts before the first ends → 1 overlap;
    // 30 chars over 2000 ms talk = 15 cps → fast at maxCps 12, not at 25
    val cues = Seq(
      Subtitles.Cue(1L, 1L, 0L, 1500L, "x" * 20),
      Subtitles.Cue(1L, 2L, 1000L, 1500L, "y" * 10),
      Subtitles.Cue(2L, 1L, 0L, 1000L, "z" * 5)).toDS().toDF()
    val at12 = Subtitles.cueStats(cues, maxCps = 12L).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = at12(1L)
    assert(d1.getLong(1) == 2L && d1.getLong(2) == 1500L &&
      d1.getLong(3) == 2000L && d1.getLong(4) == 30L &&
      d1.getLong(5) == 1L && d1.getBoolean(6))
    val d2 = at12(2L)
    assert(d2.getLong(5) == 0L && !d2.getBoolean(6)) // 5 cps
    val at25 = Subtitles.cueStats(cues, maxCps = 25L).collect()
      .map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(!at25(1L) && !at25(2L))
  }
}
