package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Subtitle/caption parsing + caption-to-frame alignment — how
  * video-text training pairs are made: captions give the TEXT,
  * sampled frames give the IMAGES, and the join key is time. Parses
  * the two formats subtitles actually ship in — WebVTT (the web
  * standard: `WEBVTT` header, `HH:MM:SS.mmm --> HH:MM:SS.mmm` cue
  * timings with optional cue identifiers and settings) and SubRip
  * SRT (numeric cue index, comma decimal separator) — then aligns
  * frame timestamps to covering cues with an equality + band join.
  * (Reference scope note: the ETL core `etl.go:12-68` has no media
  * surface; extension frontier.)
  *
  * Scale posture: parsing is a per-blob scalar routine (flatMap → one
  * row per cue, no state across docs); alignment joins on the doc key
  * FIRST with the time band as a residual — a sort-merge join on
  * doc_id at any scale, never an all-pairs time comparison.
  */
object Captions {

  final case class Cue(media_id: Long, cue_idx: Int,
      start_ms: Long, end_ms: Long, text: String)

  /** Parse a WebVTT or SRT document into cues. Format is
    * auto-detected (a `WEBVTT` first line = VTT, else SRT). Damaged
    * cues are skipped rather than failing the document — subtitle
    * files in the wild are hand-edited and partial text beats no
    * text. Returns an empty array for text with no parseable cues.
    */
  def parse(mediaId: Long, text: String): Array[Cue] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    // normalize newlines once; cues are blank-line separated blocks
    val blocks = text.replace("\r\n", "\n").replace('\r', '\n').split("\n\n+")
    var idx = 0
    for (block <- blocks) {
      val lines = block.split("\n").filter(_.nonEmpty)
      // find the timing line: the first containing "-->"
      val ti = lines.indexWhere(_.contains("-->"))
      if (ti >= 0) {
        val timing = lines(ti)
        val arrow = timing.indexOf("-->")
        val start = parseTimestamp(timing.substring(0, arrow).trim)
        // VTT allows settings after the end timestamp ("align:start")
        val endTok = timing.substring(arrow + 3).trim.split("\\s+").head
        val end = parseTimestamp(endTok)
        if (start >= 0 && end > start) {
          val cueText = lines.drop(ti + 1).mkString(" ").trim
          out += Cue(mediaId, idx, start, end, cueText)
          idx += 1
        }
      }
    }
    out.toArray
  }

  /** `HH:MM:SS.mmm` / `MM:SS.mmm` (VTT) or `HH:MM:SS,mmm` (SRT) →
    * milliseconds; -1 when unparseable.
    */
  private[graft] def parseTimestamp(s: String): Long = {
    val t = s.replace(',', '.')
    val parts = t.split(":")
    if (parts.length < 2 || parts.length > 3) return -1L
    try {
      val (h, m, rest) =
        if (parts.length == 3) (parts(0).toLong, parts(1).toLong, parts(2))
        else (0L, parts(0).toLong, parts(1))
      val secParts = rest.split("\\.")
      if (secParts.length > 2) return -1L
      val sec = secParts(0).toLong
      val ms =
        if (secParts.length == 1) 0L
        else secParts(1).padTo(3, '0').take(3).toLong
      if (m > 59 || sec > 59 || h < 0) return -1L
      ((h * 60 + m) * 60 + sec) * 1000 + ms
    } catch { case _: NumberFormatException => -1L }
  }

  /** Align frames to covering cues: doc-key equality join with the
    * `[start_ms, end_ms)` band as a residual; frames outside every
    * cue keep a −1/empty row (LEFT join — gaps between cues are
    * normal and the pipeline must see uncaptioned frames to drop or
    * interpolate them).
    */
  def alignFrames(spark: SparkSession, cues: Dataset[Cue],
      frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    frames.join(cues.toDF(),
        frames("media_id") === cues("media_id") &&
          frames("t_ms") >= cues("start_ms") && frames("t_ms") < cues("end_ms"),
        "left")
      .select(frames("media_id"), frames("frame_idx"), frames("t_ms"),
        coalesce(col("cue_idx"), lit(-1)).as("cue_idx"),
        coalesce(col("text"), lit("")).as("cue_text"))
  }
}
