package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** SubRip (.srt) and WebVTT subtitle parsing — the video↔text alignment
  * ingest path of a multimodal training pipeline (subtitle cues are how
  * speech transcripts pair with frame spans for video-text corpora).
  *
  * Both formats are public, line-oriented plain text: blank-line-separated
  * cues of [index] / `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing / text lines
  * (WebVTT: a `WEBVTT` header, `.` millisecond separators, optional cue
  * settings after the end time, optional cue indices). The parser is
  * tolerant — BOM, CRLF, missing indices, malformed cues are skipped rather
  * than thrown — because real subtitle files are messy.
  *
  * Scale shape: pure per-row string walk behind the same mapPartitions seam
  * as the other codecs; rows out ∝ cues. Zero shuffle. The reference moves
  * subtitle files only as opaque TEXT/BLOB columns — pipeline surface
  * beyond it.
  */
object Srt {

  final case class Cue(media_id: Long, cue_index: Long, start_ms: Long,
    end_ms: Long, cue_text: String)

  private val timing =
    """(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3}).*""".r

  private def ms(h: String, m: String, s: String, f: String): Long =
    h.toLong * 3600000L + m.toLong * 60000L + s.toLong * 1000L + f.toLong

  /** Parse one subtitle file (SRT or WebVTT). Cue indices are taken from
    * the file when present, otherwise assigned sequentially from 1 —
    * matching how players treat index-less WebVTT cues. */
  def parse(mediaId: Long, content: String): Seq[Cue] = {
    val clean = content.stripPrefix("\uFEFF").replace("\r\n", "\n").replace("\r", "\n")
    val blocks = clean.split("\n{2,}").toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(b => b.startsWith("WEBVTTNOTE") || b.startsWith("NOTE") ||
        b == "WEBVTT" || b.startsWith("WEBVTT\n") || b.startsWith("STYLE") ||
        b.startsWith("REGION"))
    var nextIdx = 1L
    blocks.flatMap { block =>
      val lines = block.split("\n").toSeq
      // locate the timing line: first line matching the arrow pattern
      lines.indexWhere(l => timing.pattern.matcher(l.trim).matches()) match {
        case -1 => None
        case t =>
          val idx = if (t > 0) lines(t - 1).trim.toLongOption.getOrElse(nextIdx)
                    else nextIdx
          lines(t).trim match {
            case timing(h1, m1, s1, f1, h2, m2, s2, f2) =>
              nextIdx = idx + 1
              Some(Cue(mediaId, idx, ms(h1, m1, s1, f1), ms(h2, m2, s2, f2),
                lines.drop(t + 1).mkString("\n")))
            case _ => None
          }
      }
    }
  }

  private def fmt(msTotal: Long, sep: Char): String = {
    val h = msTotal / 3600000; val m = msTotal / 60000 % 60
    val s = msTotal / 1000 % 60; val f = msTotal % 1000
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  /** Encode cues as SRT (`vtt = false`) or WebVTT (`vtt = true`). */
  def encode(cues: Seq[(Long, Long, String)], vtt: Boolean): String = {
    val sep = if (vtt) '.' else ','
    val body = cues.zipWithIndex.map { case ((start, end, text), i) =>
      s"${i + 1}\n${fmt(start, sep)} --> ${fmt(end, sep)}\n$text"
    }.mkString("\n\n")
    (if (vtt) "WEBVTT\n\n" else "") + body + "\n"
  }

  /** Per-row subtitle extraction over (media_id, kind, payload) rows —
    * UTF-8 payloads, one output row per cue. */
  def parseSubtitles(media: Dataset[Multimodal.MediaRow])
      (implicit spark: SparkSession): Dataset[Cue] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(m => parse(m.media_id, new String(m.payload, "UTF-8")))
    }
  }
}
