package graft.operators

/** robots.txt (Robots Exclusion Protocol, RFC 9309) — the compliance
  * gate every crawl-to-corpus pipeline runs before a page may become
  * training data. Parses agent groups (consecutive `User-agent`
  * lines share a group), `Allow`/`Disallow` rules with `*` wildcards
  * and the `$` end anchor, picks the most specific matching group
  * for a crawler name (longest agent prefix, `*` fallback), and
  * decides per path by LONGEST-MATCH precedence with Allow winning
  * ties — the RFC's rules, not the easier prefix-only subset.
  * (Reference scope note: the ETL core `etl.go:12-68` has no crawl
  * surface; extension frontier.)
  *
  * Scale posture: parsing is per-blob scalar; filtering joins pages
  * to their host's parsed rule set on the host key — an equality
  * join at any scale, with the rule evaluation a per-row scalar.
  */
object Robots {

  /** One rule: allow/disallow + its pattern ('*' wildcard, '$'
    * anchor). Specificity = pattern length per RFC 9309 §2.2.2.
    */
  final case class Rule(allow: Boolean, pattern: String)

  /** One group: the user-agent tokens it applies to + its rules. */
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Parse a robots.txt body. Unknown fields and comments are
    * skipped (the file format in the wild is messy by design);
    * a body with no groups yields an empty seq = everything allowed.
    */
  def parse(text: String): Seq[Group] = {
    val out = Seq.newBuilder[Group]
    var agents = Seq.newBuilder[String]
    var rules = Seq.newBuilder[Rule]
    var agentCount = 0
    var ruleCount = 0
    def flush(): Unit = {
      if (agentCount > 0) out += Group(agents.result(), rules.result())
      agents = Seq.newBuilder[String]; rules = Seq.newBuilder[Rule]
      agentCount = 0; ruleCount = 0
    }
    for (raw <- text.split("\n")) {
      val line = raw.takeWhile(_ != '#').trim // comments to end of line
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            // a UA line after rules starts a NEW group; consecutive UA
            // lines stack onto the same group
            if (ruleCount > 0) flush()
            agents += value.toLowerCase(java.util.Locale.ROOT)
            agentCount += 1
          case "allow" | "disallow" if agentCount > 0 =>
            // an empty Disallow means "allow everything" — a rule that
            // matches nothing, so simply skip it
            if (value.nonEmpty) {
              rules += Rule(field == "allow", value)
              ruleCount += 1
            } else ruleCount += 1
          case _ => () // crawl-delay, sitemap, unknown fields
        }
      }
    }
    flush()
    out.result()
  }

  /** The rules governing `agent`: the group(s) with the LONGEST
    * user-agent token that is a prefix of the agent name
    * (case-insensitive), else the `*` group(s), else no rules
    * (everything allowed). Multiple groups naming the same agent
    * merge, per the RFC.
    */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    var bestLen = -1
    for (g <- groups; tok <- g.agents if tok != "*")
      if (a.startsWith(tok) && tok.length > bestLen) bestLen = tok.length
    if (bestLen >= 0)
      groups.filter(_.agents.exists(t => t != "*" && a.startsWith(t) &&
        t.length == bestLen)).flatMap(_.rules)
    else groups.filter(_.agents.contains("*")).flatMap(_.rules)
  }

  /** Glob-style pattern match: `*` matches any run (including empty),
    * `$` at pattern end anchors to the path end; otherwise a prefix
    * match. Two-pointer with wildcard backtracking — no regex
    * compilation on the per-row hot path.
    */
  private[graft] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      // unanchored = prefix semantics: the full pattern consumed
      // against SOME prefix is a match, even with a live wildcard
      // backtrack point (backtracking further would only try to
      // consume MORE path, which prefix matching doesn't require)
      if (!anchored && pi == p.length) return true
      if (pi < p.length && (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (starPi >= 0) { pi = starPi + 1; starSi += 1; si = starSi }
      else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length // path exhausted: anchored needs full pattern consumed
  }

  /** RFC 9309 decision: the longest matching pattern wins; Allow wins
    * length ties; no match = allowed.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if matches(r.pattern, path)) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
        bestLen = len; bestAllow = r.allow
      }
    }
    bestAllow
  }

  /** One-call convenience for the per-row scalar path. */
  def isAllowed(robotsTxt: String, agent: String, path: String): Boolean =
    allowed(rulesFor(parse(robotsTxt), agent), path)

  /** Compliance-filter a URL table against per-host robots.txt
    * bodies: parse each host's policy ONCE (not per URL), join URLs
    * to their host's rule set on the host key (equality join — scale
    * path), and evaluate the longest-match decision per row. Output:
    * the URL table + an `allowed` 0/1 column.
    */
  def filterPages(spark: org.apache.spark.sql.SparkSession,
      robotsDocs: org.apache.spark.sql.DataFrame,
      urls: org.apache.spark.sql.DataFrame,
      agent: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val ruleSets = robotsDocs
      .select("media_id", "robots_txt").as[(Long, String)]
      .map { case (id, txt) =>
        (id, rulesFor(parse(txt), agent).map(r => (r.allow, r.pattern)))
      }.toDF("media_id", "rules")
    urls.select("media_id", "url_idx", "path")
      .join(ruleSets, "media_id")
      .as[(Long, Long, String, Seq[(Boolean, String)])]
      .map { case (id, u, path, rs) =>
        val rules = rs.map { case (a, p) => Rule(a, p) }
        (id, u, path, if (allowed(rules, path)) 1L else 0L)
      }.toDF("media_id", "url_idx", "path", "allowed")
  }
}
