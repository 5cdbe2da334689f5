package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Captions

/** WebVTT/SRT parsing conformance: timestamps at each field width,
  * identifier lines, cue settings, multi-line text, comma/dot
  * decimals, and the skip-damaged-cues posture.
  */
class CaptionsSpec extends AnyFunSuite {

  test("timestamps parse at every spec shape") {
    assert(Captions.parseTimestamp("00:00:01.000") == 1000L)
    assert(Captions.parseTimestamp("01:02:03.456") == 3723456L)
    assert(Captions.parseTimestamp("02:03.456") == 123456L) // MM:SS.mmm (VTT)
    assert(Captions.parseTimestamp("01:02:03,456") == 3723456L) // SRT comma
    assert(Captions.parseTimestamp("00:00:07") == 7000L) // no fraction
    assert(Captions.parseTimestamp("10:00:00.001") == 36000001L)
    assert(Captions.parseTimestamp("00:00:01.5") == 1500L) // short fraction
    for (bad <- Seq("abc", "1:2:3:4", "00:61:00.000", "00:00:61.000", ""))
      assert(Captions.parseTimestamp(bad) == -1L, s"'$bad' should not parse")
  }

  test("vtt parses: header, identifiers, settings, multi-line text") {
    val vtt =
      """WEBVTT
        |
        |intro-cue
        |00:00:01.000 --> 00:00:04.000 align:start position:10%
        |Hello
        |world
        |
        |00:00:05.500 --> 00:00:09.000
        |Second cue
        |""".stripMargin
    val cues = Captions.parse(7L, vtt)
    assert(cues.length == 2)
    assert(cues(0) == Captions.Cue(7L, 0, 1000L, 4000L, "Hello world"))
    assert(cues(1) == Captions.Cue(7L, 1, 5500L, 9000L, "Second cue"))
  }

  test("srt parses: indices and comma decimals") {
    val srt =
      """1
        |00:00:02,000 --> 00:00:04,500
        |First
        |
        |2
        |00:01:00,250 --> 00:01:02,750
        |Zweite Zeile
        |""".stripMargin
    val cues = Captions.parse(3L, srt)
    assert(cues.length == 2)
    assert(cues(0).start_ms == 2000L && cues(0).end_ms == 4500L &&
      cues(0).text == "First")
    assert(cues(1).start_ms == 60250L && cues(1).end_ms == 62750L &&
      cues(1).text == "Zweite Zeile")
  }

  test("damaged cues are skipped, not fatal; empty input yields none") {
    val mixed =
      """WEBVTT
        |
        |00:00:01.000 --> 00:00:00.500
        |end before start: dropped
        |
        |garbage --> nonsense
        |also dropped
        |
        |00:00:03.000 --> 00:00:04.000
        |kept
        |""".stripMargin
    val cues = Captions.parse(1L, mixed)
    assert(cues.length == 1 && cues(0).text == "kept" && cues(0).cue_idx == 0)
    assert(Captions.parse(1L, "").isEmpty)
    assert(Captions.parse(1L, "no cues here at all").isEmpty)
  }
}
