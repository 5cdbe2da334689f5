package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate removal — the first step of every web-scale text
  * pipeline (C4/CCNet-style: strip markup + chrome, keep the prose).
  *
  * Scale shape: the whole strip chain is a sequence of codegen'd
  * `regexp_replace` projections — narrow, no shuffle, no UDF — so it
  * fuses into one whole-stage-codegen pass over the scan at any corpus
  * size. Patterns are deliberately RE2-safe (no backreferences, no
  * lookarounds): the same chain runs under Java regex (Spark) and RE2
  * (DuckDB/Go tooling), which the oracle exploits.
  */
object Html {

  /** Container tags whose CONTENT is chrome, not prose. `head` covers
    * title/style/meta in one strike; script/style also appear inline in
    * body; nav/footer/aside are layout chrome.
    */
  private val chromeTags = Seq("head", "script", "style", "nav", "footer", "aside")

  /** Strip `htmlCol` down to its prose text: drop chrome-tag blocks,
    * drop every remaining tag, decode the four entities that survive in
    * prose, collapse whitespace. Pure narrow Column program.
    */
  def extractText(htmlCol: Column): Column = {
    val noChrome = chromeTags.foldLeft(htmlCol) { (c, tag) =>
      // (?is): case-insensitive, dot-matches-newline; non-greedy body.
      regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag>", " ")
    }
    // second pattern: a truncated document's unterminated trailing tag
    val noTags = regexp_replace(
      regexp_replace(noChrome, "(?s)<[^>]*>", " "), "(?s)<[^>]*$", " ")
    val decoded = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&nbsp;" -> " ").foldLeft(noTags) { case (c, (ent, ch)) =>
      replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Deterministic HTML wrapping of the documents table: title + h1
    * carry `doc <id>`, the text is split into 25-word paragraphs, and
    * chrome varies by id (nav on even ids, footer with entities on
    * ids divisible by 3) so conditional removal is actually exercised.
    * The extracted prose is exactly `doc <id> <text>` — replayable by
    * an oracle from the raw table without parsing HTML.
    */
  def demoHtmlCorpus(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val nChunks = ceil(size(words) / lit(25.0)).cast("int")
    val paragraphs = concat_ws("",
      transform(sequence(lit(0), greatest(nChunks - 1, lit(0))),
        i => concat(lit("<p>"),
          array_join(slice(words, i * 25 + 1, lit(25)), " "), lit("</p>"))))
    val title = concat(lit("doc "), col("doc_id"))
    docs.select(
      col("doc_id"),
      concat(
        lit("<html><head><title>"), title,
        lit("</title><style>body{font-size:12px}</style></head><body>"),
        when(col("doc_id") % 2 === 0,
          lit("<nav>home | about | contact</nav>")).otherwise(lit("")),
        lit("<h1>"), title, lit("</h1>"),
        paragraphs,
        when(col("doc_id") % 3 === 0,
          lit("<footer>&copy; 2026 example &amp; co</footer>")).otherwise(lit("")),
        lit("</body></html>")).as("html"))
  }
}
