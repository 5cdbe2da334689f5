package graft.operators

/** The ONE minimal JSON reader the byte-level walks share (Avro
  * schemas, Jupyter notebooks): objects → LinkedHashMap[String,Any],
  * arrays → ArrayBuffer[Any], strings with the full escape set,
  * numbers → Double, true/false/null. Throws IllegalArgumentException
  * on malformed input — callers translate to their null/sentinel
  * convention. Not a general-purpose library: no streaming, no
  * number-type preservation; exactly what schema/metadata documents
  * need.
  */
private[operators] object MiniJson {

  type JObj = scala.collection.mutable.LinkedHashMap[String, Any]
  type JArr = scala.collection.mutable.ArrayBuffer[Any]

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    if (!p.done) throw new IllegalArgumentException("trailing")
    v
  }

  private final class P(s: String) {
    private var p = 0
    def done: Boolean = p >= s.length
    def ws(): Unit =
      while (p < s.length && Character.isWhitespace(s.charAt(p))) p += 1
    def value(): Any = {
      ws()
      if (p >= s.length) throw new IllegalArgumentException("eof")
      s.charAt(p) match {
        case '{' =>
          p += 1
          val m = new JObj
          ws()
          if (p < s.length && s.charAt(p) == '}') { p += 1; return m }
          while (true) {
            ws()
            val k = str()
            ws()
            expect(':')
            m(k) = value()
            ws()
            if (p < s.length && s.charAt(p) == ',') p += 1
            else { expect('}'); return m }
          }
          m
        case '[' =>
          p += 1
          val a = new JArr
          ws()
          if (p < s.length && s.charAt(p) == ']') { p += 1; return a }
          while (true) {
            a += value()
            ws()
            if (p < s.length && s.charAt(p) == ',') p += 1
            else { expect(']'); return a }
          }
          a
        case '"' => str()
        case 't' => lit("true"); java.lang.Boolean.TRUE
        case 'f' => lit("false"); java.lang.Boolean.FALSE
        case 'n' => lit("null"); null
        case _ =>
          val start = p
          while (p < s.length && "+-.eE0123456789".indexOf(s.charAt(p)) >= 0)
            p += 1
          java.lang.Double.parseDouble(s.substring(start, p))
      }
    }
    private def expect(c: Char): Unit = {
      ws()
      if (p >= s.length || s.charAt(p) != c)
        throw new IllegalArgumentException(s"want $c at $p")
      p += 1
    }
    private def lit(l: String): Unit = {
      if (!s.startsWith(l, p)) throw new IllegalArgumentException(l)
      p += l.length
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (p < s.length && s.charAt(p) != '"') {
        val c = s.charAt(p)
        if (c == '\\') {
          p += 1
          if (p >= s.length) throw new IllegalArgumentException("esc")
          s.charAt(p) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              if (p + 4 >= s.length) throw new IllegalArgumentException("u")
              sb += Integer.parseInt(s.substring(p + 1, p + 5), 16).toChar
              p += 4
            case x => throw new IllegalArgumentException(s"esc $x")
          }
        } else sb += c
        p += 1
      }
      expect('"')
      sb.toString
    }
  }
}
