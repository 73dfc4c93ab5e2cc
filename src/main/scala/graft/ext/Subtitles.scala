package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Subtitle/caption parsing — SRT and WebVTT, the two dominant public
  * caption formats in video training corpora (cf. the reference's
  * pipelines, which carry no media at all — extension surface like
  * all of [[Multimodal]]). A speech/video curation pass keys on
  * exactly what these carry: cue timing (reading-speed screens),
  * cue text (the transcript a captioning model trains on), and
  * timing pathologies (overlapping or zero-length cues flag
  * machine-generated or corrupt tracks).
  *
  * Parsing is EXACT-INTEGER end to end: timestamps decode to
  * milliseconds by integer arithmetic (HH:MM:SS,mmm — comma for SRT,
  * dot for VTT, per their specs), so every downstream stat is
  * oracle-checkable. The walk follows the container-walk contract
  * ([[Multimodal.mp3Metadata]]): a malformed block ENDS the walk —
  * cues before it are kept, garbage never becomes a cue.
  *
  * Scale shape: parsing is a per-row flatMap (no shuffle, binary/text
  * never leaves the executor); the per-document stats are one
  * grouped aggregation keyed by doc — corpus-proportional, no state.
  */
object Subtitles {

  final case class Cue(doc_id: Long, idx: Long, start_ms: Long,
                       end_ms: Long, text: String)

  /** "HH:MM:SS<sep>mmm" → milliseconds; VTT additionally allows the
    * hourless "MM:SS<sep>mmm" form. None on any malformed shape.
    */
  private def parseTime(s: String, sep: Char,
                        allowHourless: Boolean): Option[Long] = {
    val t = s.trim
    val parts = t.split(':')
    def msPart(last: String): Option[(Long, Long)] = {
      val i = last.indexOf(sep)
      if (i < 0 || last.length - i - 1 != 3) None
      else for {
        sec <- last.substring(0, i).toLongOption if sec <= 59
        ms <- last.substring(i + 1).toLongOption
      } yield (sec, ms)
    }
    parts.length match {
      case 3 =>
        for {
          hh <- parts(0).toLongOption if parts(0).length >= 2
          mm <- parts(1).toLongOption if mm <= 59
          (ss, ms) <- msPart(parts(2))
        } yield ((hh * 60 + mm) * 60 + ss) * 1000 + ms
      case 2 if allowHourless =>
        for {
          mm <- parts(0).toLongOption if mm <= 59
          (ss, ms) <- msPart(parts(1))
        } yield (mm * 60 + ss) * 1000 + ms
      case _ => None
    }
  }

  /** One cue block: optional id/index lines, a `start --> end` time
    * line, then text lines until a blank. Returns (start, end, text)
    * or None when the block carries no valid time line.
    */
  private def parseBlock(lines: Seq[String], sep: Char,
                         allowHourless: Boolean): Option[(Long, Long, String)] = {
    val timeIdx = lines.indexWhere(_.contains("-->"))
    if (timeIdx < 0) return None
    val arrow = lines(timeIdx).split("-->")
    if (arrow.length != 2) return None
    // VTT time lines may carry cue settings after the end stamp
    val endField = arrow(1).trim.split("\\s+").headOption.getOrElse("")
    for {
      start <- parseTime(arrow(0), sep, allowHourless)
      end <- parseTime(endField, sep, allowHourless)
      if end >= start
    } yield (start, end, lines.drop(timeIdx + 1).mkString("\n"))
  }

  private def blocks(body: String): Iterator[Seq[String]] = {
    val lines = body.split("\n", -1).map(_.stripSuffix("\r"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    lines.foreach { l =>
      if (l.trim.isEmpty) {
        if (cur.nonEmpty) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty }
      } else cur += l
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.iterator
  }

  /** Parse an SRT document: numbered blocks, comma-millisecond
    * timestamps. Cue indices are the FILE's numbering when the block
    * starts with digits (the spec's form), else the running count. A
    * malformed block ends the walk.
    */
  def parseSrt(id: Long, body: String): Seq[Cue] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var n = 0L
    val it = blocks(body)
    var walking = true
    while (walking && it.hasNext) {
      val b = it.next()
      val explicitIdx = b.head.trim.toLongOption
      parseBlock(if (explicitIdx.isDefined) b.tail else b, ',',
        allowHourless = false) match {
        case Some((s, e, t)) =>
          n += 1
          out += Cue(id, explicitIdx.getOrElse(n), s, e, t)
        case None => walking = false
      }
    }
    out.toSeq
  }

  /** Parse a WebVTT document: requires the `WEBVTT` magic line;
    * dot-millisecond timestamps, optional hourless form, optional cue
    * identifier line, NOTE/STYLE/REGION blocks skipped. A malformed
    * CUE block ends the walk.
    */
  def parseVtt(id: Long, body: String): Seq[Cue] = {
    val bl = blocks(body).toSeq
    if (bl.isEmpty || !bl.head.head.startsWith("WEBVTT")) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var n = 0L
    var walking = true
    bl.tail.foreach { b =>
      if (walking) {
        val kind = b.head.trim
        val comment = kind.startsWith("NOTE") || kind.startsWith("STYLE") ||
          kind.startsWith("REGION")
        if (!comment) {
          parseBlock(b, '.', allowHourless = true) match {
            case Some((s, e, t)) => n += 1; out += Cue(id, n, s, e, t)
            case None => walking = false
          }
        }
      }
    }
    out.toSeq
  }

  /** Distributed cue extraction: one typed row per cue, parsing
    * inside the partition — the [[Multimodal.mp3Table]] shape.
    * `format` is "srt" or "vtt" per row.
    */
  def cueTable(ds: Dataset[(Long, String, String)]): DataFrame = {
    implicit val enc: Encoder[Cue] = Encoders.product[Cue]
    ds.mapPartitions(_.flatMap { case (id, fmt, body) =>
      if (fmt == "vtt") parseVtt(id, body) else parseSrt(id, body)
    }).toDF()
  }

  /** Per-document caption-quality statistics over a cue frame —
    * the route-by-quality screen for caption corpora. All integer:
    *  - n_cues, span_ms (last end − first start), talk_ms (Σ cue
    *    durations), n_chars (Σ codepoints of cue text)
    *  - n_overlaps: cues starting before the previous cue (by start
    *    order) ended — machine-merged or corrupt timing
    *  - fast: reading speed exceeds `maxCps` chars/sec, decided by
    *    the integer cross-multiplication n_chars·1000 > maxCps·talk_ms
    *    (no division, no float)
    */
  def cueStats(cues: DataFrame, maxCps: Long = 25L): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("start_ms"), col("end_ms"), col("idx"))
    cues
      .withColumn("__prev_end", lag(col("end_ms"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_cues"),
        (max(col("end_ms")) - min(col("start_ms"))).as("span_ms"),
        sum(col("end_ms") - col("start_ms")).as("talk_ms"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(when(col("__prev_end").isNotNull &&
          col("start_ms") < col("__prev_end"), 1L).otherwise(0L))
          .as("n_overlaps"))
      .withColumn("fast",
        col("n_chars") * 1000L > lit(maxCps) * col("talk_ms"))
  }
}
