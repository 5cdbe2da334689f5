package graft.operators

/** Jupyter notebook (.ipynb, nbformat 4) cell extraction — the
  * format code-training corpora arrive in. Parses the JSON document
  * via [[MiniJson]]: `cells[]` with `cell_type`, `source` (a string
  * OR the conventional array-of-lines form — both normalize),
  * `execution_count`, and `outputs[]`; notebook-level nbformat
  * verified. nbformat 3 (worksheets) is a named profile gap, not
  * damage. Null on malformed JSON or structure.
  */
object Ipynb {

  final case class Cell(cellType: String, source: String,
      execCount: Long, nOutputs: Int)

  private def asObj(v: Any): MiniJson.JObj = v match {
    case m: scala.collection.mutable.LinkedHashMap[_, _] =>
      m.asInstanceOf[MiniJson.JObj]
    case _ => null
  }

  private def asArr(v: Any): MiniJson.JArr = v match {
    case a: scala.collection.mutable.ArrayBuffer[_] =>
      a.asInstanceOf[MiniJson.JArr]
    case _ => null
  }

  private def sourceText(v: Any): String = v match {
    case s: String => s
    case a: scala.collection.mutable.ArrayBuffer[_] =>
      val sb = new StringBuilder
      a.foreach {
        case s: String => sb ++= s
        case _ => return null
      }
      sb.toString
    case _ => null
  }

  /** Every cell in order; null on damage or an unsupported
    * nbformat.
    */
  def cells(json: String): Array[Cell] = try {
    val root = asObj(MiniJson.parse(json))
    if (root == null) return null
    root.getOrElse("nbformat", null) match {
      case d: java.lang.Double if d.doubleValue() == 4.0 => ()
      case _ => return null // nbformat 3 worksheets: named profile
    }
    val cs = asArr(root.getOrElse("cells", null))
    if (cs == null) return null
    val out = new Array[Cell](cs.length)
    for (i <- cs.indices) {
      val c = asObj(cs(i))
      if (c == null) return null
      val tpe = c.getOrElse("cell_type", null) match {
        case s: String => s
        case _ => return null
      }
      val src = sourceText(c.getOrElse("source", null))
      if (src == null) return null
      val exec = c.getOrElse("execution_count", null) match {
        case d: java.lang.Double => d.longValue()
        case _ => -1L
      }
      val nOut = asArr(c.getOrElse("outputs", null)) match {
        case null => 0
        case a => a.length
      }
      out(i) = Cell(tpe, src, exec, nOut)
    }
    out
  } catch { case _: RuntimeException => null }

  /** Whether a JSON document is an nbformat-3 notebook — readable
    * structure, out-of-subset version.
    */
  def unsupportedProfile(json: String): Boolean = try {
    val root = asObj(MiniJson.parse(json))
    root != null && (root.getOrElse("nbformat", null) match {
      case d: java.lang.Double => d.doubleValue() < 4.0
      case _ => false
    })
  } catch { case _: RuntimeException => false }

  /** A real nbformat-4 notebook document from (type, source,
    * execCount, nOutputs) cells — array-of-lines source form, the
    * convention real exporters write.
    */
  def synth(cellSpecs: Seq[(String, String, Long, Int)]): String = {
    def jstr(s: String): String = {
      val sb = new StringBuilder("\"")
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\t' => sb ++= "\\t"
        case '\r' => sb ++= "\\r"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      sb += '"'
      sb.toString
    }
    val cellsJson = cellSpecs.map { case (tpe, src, exec, nOut) =>
      // split into the array-of-lines convention (newlines kept)
      val lines = src.split("(?<=\n)", -1).filter(_.nonEmpty)
      val srcJson = lines.map(jstr).mkString("[", ",", "]")
      val outputs = (0 until nOut).map(k =>
        s"""{"output_type":"stream","name":"stdout","text":[${jstr(s"out$k\n")}]}""")
        .mkString("[", ",", "]")
      val execJson = if (exec < 0) "null" else exec.toString
      if (tpe == "code")
        s"""{"cell_type":"code","execution_count":$execJson,""" +
          s""""metadata":{},"outputs":$outputs,"source":$srcJson}"""
      else
        s"""{"cell_type":${jstr(tpe)},"metadata":{},"source":$srcJson}"""
    }.mkString("[", ",", "]")
    s"""{"cells":$cellsJson,"metadata":{"language_info":{"name":"python"}},""" +
      s""""nbformat":4,"nbformat_minor":5}"""
  }
}
