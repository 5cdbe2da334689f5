package graft

import org.apache.spark.sql.functions._

import graft.operators.Html
import graft.sources.Tables

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("t"))
      .head.getString(0)

  test("strip chain: chrome blocks, tags, entities, whitespace") {
    assert(extract("<html><body><p>hello world</p></body></html>") == "hello world")
    // chrome-tag CONTENT is dropped entirely
    assert(extract("<head><title>nope</title></head><p>kept</p>") == "kept")
    assert(extract("<script>var x = 'evil';</script>ok") == "ok")
    assert(extract("<NAV class=\"top\">menu</NAV>body text") == "body text")
    // case-insensitive, attributes, multi-line bodies
    assert(extract("<Style>\n.a{color:red}\n</Style>one  two\n three") == "one two three")
    // entities decode AFTER tag removal
    assert(extract("<p>a &amp; b &lt;tag&gt; c&nbsp;d</p>") == "a & b <tag> c d")
    // nested different chrome tags both go
    assert(extract("<footer><nav>x</nav>y</footer>z") == "z")
    // unterminated tag degrades to dropping the fragment, never throws
    assert(extract("text <b unclosed") == "text")
    assert(extract("") == "")
  }

  test("demo corpus: extracted prose is exactly 'doc <id> <text>'") {
    val docs = Tables.load(spark, sf0001, "documents").limit(100)
    val got = Html.demoHtmlCorpus(docs)
      .select(col("doc_id"), Html.extractText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val expected = s"doc $id ${text.trim.replaceAll("\\s+", " ")}".trim
      assert(got(id) == expected, s"doc $id mismatch")
    }
    // chrome varies by id, and none of it leaks
    assert(got.values.forall(t => !t.contains("<") && !t.contains("home | about")))
    assert(got.values.forall(t => !t.contains("font-size") && !t.contains("2026 example")))
  }
}
