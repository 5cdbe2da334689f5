package graft.operators

/** From-scratch mbox + RFC 5322/2045/2047 email parsing — the
  * classic text-training corpus format (mailing-list archives,
  * Enron-style drops).
  *
  *  - mbox splitting on "From " separator lines, with mboxrd
  *    ">From " unescaping inside bodies;
  *  - header UNFOLDING (continuation lines), case-insensitive field
  *    access;
  *  - RFC 2047 encoded-words in headers (=?charset?B/Q?...?=,
  *    Q-encoding's underscore-as-space rule);
  *  - MIME multipart walking (boundary lines, nested multiparts,
  *    preamble/epilogue skipped) and per-part
  *    Content-Transfer-Encoding decode: quoted-printable from
  *    scratch (=XX, soft line breaks), base64 via the JDK's MIME
  *    decoder, 7bit/8bit/binary verbatim;
  *  - charset honoring through java.nio charsets.
  *
  * The independent pin is Python's reference `email` package
  * (live-gated in the spec, both directions). Null on damage.
  */
object Mbox {

  // mboxrd From-quoting, compiled ONCE (split runs per partition)
  private val QuotedFrom = java.util.regex.Pattern.compile("^>+From .*")
  private val PlainOrQuotedFrom =
    java.util.regex.Pattern.compile("^>*From .*")

  final case class Part(contentType: String, charset: String,
      text: String, bytes: Array[Byte])

  final case class Message(headers: Map[String, String], subject: String,
      from: String, parts: Array[Part])

  // ---- mbox splitting --------------------------------------------------

  /** Split an mbox into raw message blocks (bytes between "From "
    * separator lines), unescaping mboxrd ">From " quoting.
    */
  def split(b: Array[Byte]): Array[Array[Byte]] = {
    if (b == null) return null
    val text = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!text.startsWith("From ")) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // -1 keeps empty lines; the artificial segment after the final
    // newline is not a line
    val lines0 = text.split("\n", -1)
    val lines =
      if (text.endsWith("\n")) lines0.dropRight(1) else lines0
    val cur = new StringBuilder
    var started = false
    def flush(): Unit = if (started) {
      // the blank line before the next separator is the message
      // DELIMITER, not body — strip exactly one (the convention the
      // reference python mailbox reader applies)
      var block = cur.toString
      if (block.endsWith("\n\n")) block = block.dropRight(1)
      out += block.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      cur.clear()
    }
    for (line <- lines) {
      if (line.startsWith("From ")) {
        flush()
        started = true // separator line itself is not message content
      } else if (started) {
        // mboxrd: any >...>From quoting drops ONE level
        val l =
          if (QuotedFrom.matcher(line).matches()) line.substring(1)
          else line
        cur ++= l
        cur += '\n'
      }
    }
    flush()
    if (out.isEmpty) null else out.toArray
  }

  // ---- headers ---------------------------------------------------------

  /** Unfold and parse the header block; returns (headers lowercased
    * keys, bodyOffset) or null.
    */
  private def headerBlock(s: String): (Map[String, String], Int) = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var p = 0
    var lastKey: String = null
    while (p < s.length) {
      val e0 = s.indexOf('\n', p)
      val e = if (e0 < 0) s.length else e0
      val rawLine = s.substring(p, e)
      val line = if (rawLine.endsWith("\r")) rawLine.dropRight(1) else rawLine
      if (line.isEmpty) return (out.toMap, e + 1) // blank line = body
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        if (lastKey == null) return null // continuation before any field
        out(lastKey) = out(lastKey) + " " + line.trim
      } else {
        val c = line.indexOf(':')
        if (c <= 0) return null
        lastKey = line.substring(0, c).trim.toLowerCase
        out(lastKey) = line.substring(c + 1).trim
      }
      p = e + 1
    }
    (out.toMap, s.length)
  }

  /** RFC 2047 encoded-word decoding for header values. */
  private[graft] def decodeWords(v: String): String = {
    val re = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r
    // RFC 2047 §6.2: linear whitespace BETWEEN adjacent encoded
    // words is deleted (the reference parser agrees)
    var out = v.replaceAll("(\\?=)[ \\t]+(=\\?)", "$1$2")
    var changed = true
    while (changed) {
      changed = false
      re.findFirstMatchIn(out) match {
        case Some(m) =>
          val cs = try java.nio.charset.Charset.forName(m.group(1))
            catch { case _: Exception => null }
          if (cs == null) return out
          val payload = m.group(2).toLowerCase match {
            case "b" =>
              try java.util.Base64.getMimeDecoder.decode(m.group(3))
              catch { case _: IllegalArgumentException => null }
            case _ =>
              qpDecode(m.group(3).replace('_', ' '), qEncoding = true)
          }
          if (payload == null) return out
          out = out.substring(0, m.start) + new String(payload, cs) +
            out.substring(m.end)
          changed = true
        case None => ()
      }
    }
    // adjacent encoded words' separating whitespace was consumed
    // above only textually; plain values pass through
    out
  }

  /** Quoted-printable decode (RFC 2045 §6.7); `qEncoding` skips the
    * soft-break rule (header Q-encoding has none). Null on a
    * malformed escape.
    */
  private[graft] def qpDecode(s: String, qEncoding: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var p = 0
    while (p < s.length) {
      val c = s.charAt(p)
      if (c == '=') {
        if (!qEncoding && p + 1 < s.length && s.charAt(p + 1) == '\n') {
          p += 2 // soft break LF
        } else if (!qEncoding && p + 2 < s.length && s.charAt(p + 1) == '\r' &&
            s.charAt(p + 2) == '\n') {
          p += 3 // soft break CRLF
        } else {
          if (p + 3 > s.length) return null // '=' needs two hex chars
          val v = try Integer.parseInt(s.substring(p + 1, p + 3), 16)
            catch { case _: NumberFormatException => return null }
          out.write(v)
          p += 3
        }
      } else {
        out.write(c.toInt & 0xFF)
        p += 1
      }
    }
    out.toByteArray
  }

  // ---- MIME ------------------------------------------------------------

  /** A Content-Type parameter, name matched case-insensitively but
    * the VALUE case-preserved — boundaries are case-sensitive
    * tokens (real mailers emit uppercase in them).
    */
  private def param(ct: String, name: String): String = {
    val re = ("(?i)" + name + "\\s*=\\s*(\"([^\"]*)\"|[^;\\s]+)").r
    re.findFirstMatchIn(ct) match {
      case Some(m) =>
        val g = m.group(1)
        if (g.startsWith("\"")) m.group(2) else g
      case None => null
    }
  }

  private def decodeBody(body: String, cte: String): Array[Byte] =
    cte.toLowerCase match {
      case "base64" =>
        try java.util.Base64.getMimeDecoder.decode(body)
        catch { case _: IllegalArgumentException => null }
      case "quoted-printable" => qpDecode(body)
      case _ => body.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }

  private def parsePart(s: String, depth: Int): Array[Part] = {
    if (depth > 8) return null
    val hb = headerBlock(s)
    if (hb == null) return null
    val (headers, bodyOff) = hb
    val ct = headers.getOrElse("content-type", "text/plain")
    val mediaType = ct.split(";")(0).trim.toLowerCase
    val body = s.substring(math.min(bodyOff, s.length))
    if (mediaType.startsWith("multipart/")) {
      val boundary = param(ct, "boundary")
      if (boundary == null) return null
      val sep = "--" + boundary
      val lines = body.split("\n", -1)
      val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Part]]
      var cur: StringBuilder = null
      var done = false
      for (line0 <- lines if !done) {
        val raw = if (line0.endsWith("\r")) line0.dropRight(1) else line0
        // RFC 2046 §5.1.1: delimiter lines may carry trailing
        // transport padding (WSP*)
        val line = raw.replaceAll("[ \\t]+$", "")
        if (line == sep) {
          if (cur != null) {
            val sub = parsePart(cur.toString.stripSuffix("\n"), depth + 1)
            if (sub == null) return null
            parts += sub
          }
          cur = new StringBuilder
        } else if (line == sep + "--") {
          if (cur != null) {
            val sub = parsePart(cur.toString.stripSuffix("\n"), depth + 1)
            if (sub == null) return null
            parts += sub
          }
          cur = null
          done = true // epilogue ignored
        } else if (cur != null) {
          cur ++= line0
          cur += '\n'
        } // else: preamble, ignored
      }
      if (!done) return null // missing terminating boundary
      parts.flatten.toArray
    } else {
      val cte = headers.getOrElse("content-transfer-encoding", "7bit")
      val raw = decodeBody(body, cte)
      if (raw == null) return null
      val csName = Option(param(ct, "charset")).getOrElse("us-ascii")
      val cs = try java.nio.charset.Charset.forName(csName)
        catch { case _: Exception => null }
      val text =
        if (mediaType.startsWith("text/") && cs != null) new String(raw, cs)
        else null
      Array(Part(mediaType, if (cs == null) "" else cs.name(), text, raw))
    }
  }

  /** Parse one raw message (headers + MIME body). Null on damage. */
  def message(raw: Array[Byte]): Message = try {
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hb = headerBlock(s)
    if (hb == null) return null
    val headers = hb._1
    val parts = parsePart(s, 0)
    if (parts == null) return null
    Message(headers,
      decodeWords(headers.getOrElse("subject", "")),
      decodeWords(headers.getOrElse("from", "")), parts)
  } catch {
    case _: StackOverflowError => null
    case _: RuntimeException => null
  }

  // ---- write side ------------------------------------------------------

  private[graft] def qpEncode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var lineLen = 0
    data.foreach { byte =>
      val c = byte & 0xFF
      val enc =
        if (c == '\n') { sb += '\n'; lineLen = 0; "" }
        else if (c >= 33 && c <= 126 && c != '=') c.toChar.toString
        else f"=$c%02X"
      if (lineLen + enc.length > 72) { sb ++= "=\n"; lineLen = 0 }
      sb ++= enc
      lineLen += enc.length
    }
    sb.toString
  }

  /** A real mbox from (subject, fromAddr, textParts) messages: each
    * message multipart/mixed when it has >1 part, parts cycling
    * 7bit / quoted-printable / base64 transfer encodings, subjects
    * RFC 2047 B-encoded when they leave ASCII.
    */
  def synthMbox(messages: Seq[(String, String, Seq[String])]): Array[Byte] = {
    val sb = new StringBuilder
    for (((subject, from, parts), mi) <- messages.zipWithIndex) {
      sb ++= s"From MAILER-DAEMON Thu Jan  1 00:00:0$mi 2026\n"
      val subj =
        if (subject.forall(c => c >= ' ' && c < 127)) subject
        else "=?UTF-8?B?" + java.util.Base64.getEncoder.encodeToString(
          subject.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + "?="
      sb ++= s"From: $from\n"
      sb ++= s"Subject: $subj\n"
      sb ++= "MIME-Version: 1.0\n"
      def bodyFor(text: String, idx: Int): (String, String) =
        (idx % 3) match {
          case 0 =>
            // identity transfer encoding: carry the text's UTF-8
            // BYTES through the latin-1 assembly (8bit when it
            // actually leaves ASCII)
            (if (text.forall(_ < 128)) "7bit" else "8bit",
              new String(text.getBytes(
                java.nio.charset.StandardCharsets.UTF_8),
                java.nio.charset.StandardCharsets.ISO_8859_1))
          case 1 => ("quoted-printable", qpEncode(text.getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
          case _ => ("base64", java.util.Base64.getMimeEncoder(60,
            "\n".getBytes).encodeToString(text.getBytes(
              java.nio.charset.StandardCharsets.UTF_8)))
        }
      if (parts.length == 1) {
        val (cte, body) = bodyFor(parts.head, mi)
        sb ++= "Content-Type: text/plain; charset=utf-8\n"
        sb ++= s"Content-Transfer-Encoding: $cte\n\n"
        // mboxrd: escape body lines starting with From / >From; the
        // artificial empty segment after a trailing newline is not a
        // line
        val bl = body.split("\n", -1)
        (if (body.endsWith("\n")) bl.dropRight(1) else bl).foreach { l =>
          if (PlainOrQuotedFrom.matcher(l).matches()) sb ++= ">"
          sb ++= l
          sb += '\n'
        }
      } else {
        val boundary = s"=-=graft-$mi-boundary=-="
        sb ++= s"""Content-Type: multipart/mixed; boundary="$boundary"\n\n"""
        sb ++= "preamble to ignore\n"
        for ((t, pi) <- parts.zipWithIndex) {
          val (cte, body) = bodyFor(t, pi)
          sb ++= s"--$boundary\n"
          sb ++= "Content-Type: text/plain; charset=utf-8\n"
          sb ++= s"Content-Transfer-Encoding: $cte\n\n"
          val bl = body.split("\n", -1)
          (if (body.endsWith("\n")) bl.dropRight(1) else bl).foreach { l =>
            if (PlainOrQuotedFrom.matcher(l).matches()) sb ++= ">"
            sb ++= l
            sb += '\n'
          }
          sb += '\n' // the delimiter OWNS its preceding newline
        }
        sb ++= s"--$boundary--\n"
      }
      sb += '\n'
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
