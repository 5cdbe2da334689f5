package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots

/** RFC 9309 semantics: group selection by longest agent prefix,
  * longest-match rule precedence with Allow winning ties, `*`
  * wildcards, `$` anchors, comments, and messy-file tolerance.
  */
class RobotsSpec extends AnyFunSuite {

  private val policy =
    """# example policy
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/pub/
      |Disallow: /*.tmp$
      |Crawl-delay: 5
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /bot-only/
      |
      |Sitemap: https://x.test/sitemap.xml
      |""".stripMargin

  test("pattern matching: prefix, wildcard, anchor") {
    assert(Robots.matches("/a", "/abc"))
    assert(Robots.matches("/a/", "/a/b"))
    assert(!Robots.matches("/a/", "/ab"))
    assert(Robots.matches("/*.tmp$", "/x/y.tmp"))
    assert(!Robots.matches("/*.tmp$", "/x/y.tmpz"))
    assert(Robots.matches("/a*b", "/axxbzz")) // prefix consumed mid-path
    assert(Robots.matches("/a*b$", "/axxb"))
    assert(!Robots.matches("/a*b$", "/axxbzz"))
    assert(Robots.matches("/*", "/anything"))
    assert(Robots.matches("/p/*/q", "/p/x/q/r"))
    assert(!Robots.matches("/z", "/a"))
  }

  test("group selection: longest agent prefix, * fallback, merging") {
    val groups = Robots.parse(policy)
    assert(groups.length == 2)
    // graftbot gets ONLY its specific group — the * rules vanish
    val bot = Robots.rulesFor(groups, "GraftBot/1.0")
    assert(bot.map(_.pattern) == Seq("/bot-only/"))
    // an unnamed agent gets the * group
    val other = Robots.rulesFor(groups, "randombot")
    assert(other.map(_.pattern) == Seq("/private/", "/private/pub/", "/*.tmp$"))
    // no groups at all = everything allowed
    assert(Robots.isAllowed("just text, no rules", "anybot", "/x"))
  }

  test("decision: longest match wins, Allow breaks ties") {
    val rules = Robots.rulesFor(Robots.parse(policy), "randombot")
    assert(!Robots.allowed(rules, "/private/secret"))
    assert(Robots.allowed(rules, "/private/pub/ok")) // longer Allow wins
    assert(!Robots.allowed(rules, "/cache/f.tmp"))
    assert(Robots.allowed(rules, "/cache/f.tmpx")) // anchor near-miss
    assert(Robots.allowed(rules, "/open/page"))
    // equal-length tie: Allow wins per the RFC
    val tie = Seq(Robots.Rule(allow = false, "/dir/"),
      Robots.Rule(allow = true, "/dir/"))
    assert(Robots.allowed(tie, "/dir/x"))
  }

  test("messy files: comments, blank Disallow, case, CRLF") {
    val messy = "USER-AGENT: *\r\nDISALLOW:\r\nDisallow: /x/ # trailing\r\n"
    val rules = Robots.rulesFor(Robots.parse(messy), "bot")
    assert(rules.map(_.pattern) == Seq("/x/")) // blank Disallow dropped
    assert(!Robots.allowed(rules, "/x/page"))
    assert(Robots.allowed(rules, "/y/page"))
  }
}
