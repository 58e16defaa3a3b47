package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + duplicate grouping — the first dedup pass a
  * crawl pipeline runs, BEFORE any content hashing: the same page
  * arrives as `HTTPS://WWW.Example.COM:443/a/`, `https://example.com/a`
  * and `https://example.com/a?utm_source=feed#top`, and fetching or
  * content-hashing all three wastes the crawl budget.
  *
  * Canonical form: scheme and host lowercased; leading `www.` and the
  * scheme's default port (`:443` https / `:80` http) dropped; fragment
  * dropped; `utm_*` tracking parameters dropped (other query params
  * KEPT — they select content); trailing slashes trimmed. All per-row
  * regex/array column work (RE2-safe — no lookarounds), zero shuffle;
  * the grouping is one hash aggregation on the canonical string.
  */
object Urls {

  /** Canonicalize one URL column. Non-URL strings (no `scheme://`)
    * pass through unchanged — a crawl manifest's malformed rows must
    * stay graded rows, not nulls. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(regexp_extract(noFrag, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val keptParams = filter(split(query, "&"),
      p => substring(p, 1, 4) =!= "utm_" && p =!= "")
    val queryPart = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    when(scheme === "", url) // not a URL: pass through
      .otherwise(concat(scheme, lit("://"), host, path, queryPart))
  }

  /** Deterministic synthetic crawl manifest: one URL per document,
    * closed-form in the id — four encoding variants (canonical, cased +
    * www, default port + trailing slash, and a different-host URL with
    * a REAL query param plus tracking junk) so every canonicalization
    * rule fires. Mirrored by the oracle's SQL expression. */
  def syntheticUrl(docId: Column): Column = {
    val p = (docId % 7).cast("string")
    val g = (docId % 10).cast("string")
    when(docId % 4 === 0,
        concat(lit("https://example.com/art/"), p, lit("/item/"), g))
      .when(docId % 4 === 1,
        concat(lit("HTTPS://WWW.Example.COM/art/"), p, lit("/item/"), g))
      .when(docId % 4 === 2,
        concat(lit("https://example.com:443/art/"), p, lit("/item/"), g, lit("/")))
      .otherwise(
        concat(lit("http://example.org/art/"), p, lit("?id="), g,
          lit("&utm_source=feed&utm_campaign=x#top")))
  }

  /** Robots-exclusion rule set (RFC 9309 semantics) for the graded
    * fixture: path-prefix rules, LONGEST match wins, allow wins ties —
    * including nested allow-inside-disallow pairs so the longest-match
    * logic is load-bearing. allow is 0/1 so the winner key
    * `len(prefix)·2 + allow` is a single integer argmax. */
  val RobotRules: Seq[(String, Int)] = Seq(
    ("/", 1), ("/private", 0), ("/private/pub", 1),
    ("/search", 0), ("/api", 0), ("/api/v2/open", 1))

  /** Deterministic crawl-frontier path per document, hitting every rule
    * class: nested allow, plain disallow, deep allow-override, and the
    * default-allow fallback. */
  def syntheticPath(docId: Column): Column = {
    val p = (docId % 7).cast("string")
    when(docId % 5 === 0, concat(lit("/private/pub/"), p))
      .when(docId % 5 === 1, concat(lit("/private/cache/"), p))
      .when(docId % 5 === 2, concat(lit("/search/"), p))
      .when(docId % 5 === 3, concat(lit("/api/v2/open/"), p))
      .otherwise(concat(lit("/articles/"), p))
  }

  /** The RFC 9309 winner (longest rule, allow on ties) as a CLOSED-FORM
    * when-chain over the static rule set: rules sorted by the same
    * integer key `len(prefix)·2 + allow` descending, first prefix match
    * wins. Semantically identical to [[robotsDecisions]]' broadcast-join
    * argmax (spec-asserted) but a pure per-row expression — no join, no
    * shuffle, stays inside whole-stage codegen; the right form when the
    * gate sits inside a longer chain. Returns struct(prefix, allow);
    * null only for strings that match no rule (non-paths — every
    * `/`-rooted path matches the root rule). */
  def robotsRuleExpr(path: Column): Column = {
    val ordered = RobotRules.sortBy { case (p, a) => -(p.length * 2 + a) }
    ordered.foldLeft(lit(null)
        .cast("struct<prefix:string,allow:int>")) { case (acc, (p, a)) =>
      coalesce(acc, when(path.startsWith(p),
        struct(lit(p).as("prefix"), lit(a).as("allow"))))
    }
  }

  /** Graded query: the crawl-politeness gate. Every frontier path joins
    * the broadcast rule table on prefix match; the RFC 9309 winner
    * (longest rule, allow on ties) is ONE integer-keyed argmax — no
    * window, no per-rule rescans. Rows: (doc_id, path, matched_rule,
    * allowed). */
  def robotsDecisions(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = RobotRules.toDF("prefix", "allow")
    docs.select(col(idCol), syntheticPath(col(idCol)).as("path"))
      .join(broadcast(rules), col("path").startsWith(col("prefix")))
      .groupBy(col(idCol), col("path"))
      .agg(max(struct((length(col("prefix")) * 2 + col("allow")).as("key"),
        col("prefix"), col("allow"))).as("__w"))
      .select(col(idCol), col("path"), col("__w.prefix").as("matched_rule"),
        (col("__w.allow") === 1).as("allowed"))
      .orderBy(idCol)
  }

  /** Sitemap (sitemaps.org XML) parsing — the OTHER crawl-control file
    * next to robots.txt: per feed, `<url>` entries with `<loc>` (entity-
    * decoded — `&amp;` is mandatory XML escaping inside a URL), optional
    * `<lastmod>`, optional `<priority>` (landed as an exact integer
    * permille — 0.8 is not a double here). XML comments strip FIRST so
    * a commented-out entry can't leak; entries missing `<loc>` are
    * skipped (the spec marks them invalid). Regexes are RE2-safe like
    * the HTML family's, so the oracle runs them verbatim; pure per-feed
    * projection + per-entry Generate, zero shuffle before the
    * presentation sort. */
  val SitemapCommentRe: String = "(?s)<!--.*?-->"
  val SitemapUrlRe: String = "(?is)<url>(.*?)</url>"

  private def tagText(entry: Column, tag: String): Column =
    regexp_extract(entry, s"(?is)<$tag>(.*?)</$tag>", 1)

  def sitemapEntries(feeds: DataFrame, xmlCol: String = "sitemap_xml",
                     idCol: String = "doc_id"): DataFrame = {
    feeds.select(col(idCol),
        posexplode(expr(
          s"regexp_extract_all(regexp_replace($xmlCol, '$SitemapCommentRe', ''), " +
            s"'$SitemapUrlRe', 1)")).as(Seq("pos", "entry")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("entry_id"),
        Html.entityDecode(tagText(col("entry"), "loc")).as("loc"),
        tagText(col("entry"), "lastmod").as("lastmod"),
        coalesce(
          when(tagText(col("entry"), "priority") === "", lit(null))
            .otherwise((tagText(col("entry"), "priority").cast("decimal(6,3)") * 1000)
              .cast("long")),
          lit(500L)).as("priority_permille"))
      .filter(col("loc") =!= "")
  }

  /** Deterministic sitemap fixture: three entries per feed (absolute
    * locs with a mandatory `&amp;` escape, varying lastmod, an explicit
    * priority on one, the default 0.5 on another) plus a commented-out
    * entry and a loc-less entry that must both vanish. */
  def sitemapDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("sitemap_xml", concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      lit("<url><loc>https://"), col("source"), lit(".example/p/"),
      (col(idCol) % 50).cast("string"), lit("?a=1&amp;b=2</loc>"),
      lit("<lastmod>2026-01-"),
      lpad(((col(idCol) % 28) + 1).cast("string"), 2, "0"),
      lit("</lastmod><priority>0."), (col(idCol) % 10).cast("string"),
      lit("</priority></url>"),
      lit("<!-- <url><loc>https://never.example/x</loc></url> -->"),
      lit("<url><loc>https://"), col("source"), lit(".example/q/"),
      (col(idCol) % 20).cast("string"), lit("</loc></url>"),
      lit("<url><lastmod>2026-02-01</lastmod></url>"), // loc-less: skipped
      lit("<url><loc>https://cdn.example/r/"), (col(idCol) % 7).cast("string"),
      lit("</loc><priority>1.0</priority></url>"),
      lit("</urlset>")))

  // ------------------------------------------------------ robots.txt parsing

  /** Parse a robots.txt BODY for one user agent (RFC 9309 §2.2): lines
    * split, `#` comments stripped, directive names case-insensitive;
    * consecutive `User-agent` lines open a group whose rules run until
    * the next group; the agent's effective group is the MOST SPECIFIC
    * match — its exact name beats `*`, and groups NEVER merge (the
    * classic crawler mistake is folding the `*` group into the named
    * one; the fixture plants a `*`-only rule that must NOT apply).
    * Empty `Disallow:` means allow-all (contributes no rule). Non-group
    * lines (`Sitemap:`, `Crawl-delay:`, unknown) are ignored. Returns
    * (path-prefix, allow 0/1) rules — prefix semantics, the form the
    * longest-match gate consumes; `*`/`$` pattern rules are out of
    * scope (documented boundary — the overwhelming majority of real
    * rules are plain prefixes). */
  def parseRobots(txt: String, agent: String): Seq[(String, Int)] =
    parseRobotsGroup(txt, agent)._1

  /** Crawl-delay (seconds) of the agent's selected group, if any —
    * same group-selection semantics as the rules (the decoy group's
    * delay must not leak). Non-numeric values are ignored (the
    * tolerant reading real crawlers use for this non-RFC directive). */
  def parseCrawlDelay(txt: String, agent: String): Option[Int] =
    parseRobotsGroup(txt, agent)._2

  /** The selected group's (rules, crawl-delay) — see [[parseRobots]]
    * for the group-selection semantics. */
  def parseRobotsGroup(txt: String,
                       agent: String): (Seq[(String, Int)], Option[Int]) = {
    final case class Group(agents: Seq[String], rules: Seq[(String, Int)],
                           delay: Option[Int])
    val groups = Seq.newBuilder[Group]
    var agents = Seq.empty[String]
    var rules = Seq.newBuilder[(String, Int)]
    var delay: Option[Int] = None
    var inAgents = false // consecutive User-agent lines share one group
    def closeGroup(): Unit =
      if (agents.nonEmpty) { groups += Group(agents, rules.result(), delay) }
    for (raw <- txt.split("\n", -1)) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (!inAgents) {
              closeGroup(); agents = Nil; rules = Seq.newBuilder; delay = None
            }
            agents :+= value.toLowerCase
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            if (value.nonEmpty) rules += ((value, if (name == "allow") 1 else 0))
          case "crawl-delay" =>
            inAgents = false
            if (value.nonEmpty && value.forall(_.isDigit)) delay = Some(value.toInt)
          case _ => inAgents = false // Sitemap:, unknown
        }
      }
    }
    closeGroup()
    val all = groups.result()
    val mine = agent.toLowerCase
    // RFC 9309 §2.2.1: rules from ALL groups naming the same agent
    // combine into one rule set (a robots.txt may split an agent's
    // policy across non-adjacent groups); only when NO group names the
    // agent does the * group apply — and then again every * group.
    // Crawl-delay (non-RFC) is taken from the first matching group that
    // defines one, deterministically.
    val exact = all.filter(_.agents.contains(mine))
    val chosen = if (exact.nonEmpty) exact else all.filter(_.agents.contains("*"))
    (chosen.flatMap(_.rules), chosen.flatMap(_.delay).headOption)
  }

  /** Deterministic per-SOURCE robots.txt fixture (host = source.example)
    * exercising every parse hazard: a decoy `otherbot` disallow-all
    * group, the graftbot group with nested allow-overrides, case-mixed
    * directive names, comments, an empty Disallow, a Sitemap line, and
    * a `*` group whose `/private` rule must NOT leak into graftbot's
    * decisions (the * group applies only when no group names the
    * agent, RFC 9309 §2.2.1). Sources with digit % 3 == 0 add a
    * `Disallow: /q` — per-host policies genuinely differ. */
  def robotsTxtOf(source: Column): Column = {
    val n = regexp_extract(source, "([0-9]+)", 1).cast("int")
    concat(
      lit("# crawl policy for "), source, lit("\n"),
      lit("User-agent: otherbot\nDisallow: /\nCrawl-delay: 99\n\n"),
      lit("User-Agent: graftbot\n"),
      concat(lit("Crawl-delay: "), (pmod(n, lit(2)) + 1).cast("string"), lit("\n")),
      lit("disallow: /search\n"),
      lit("Allow: /search/archive\n"),
      lit("Disallow: /api # trailing comment\n"),
      lit("ALLOW: /api/v2/open\n"),
      when(pmod(n, lit(3)) === 0, lit("Disallow: /q\n")).otherwise(lit("")),
      lit("Disallow:\n"), // empty: allow-all, contributes no rule
      lit("Sitemap: https://example.com/sitemap.xml\n\n"),
      lit("User-agent: *\nDisallow: /private\n"))
  }

  /** Per-host frontier path (a superset of [[syntheticPath]]'s classes,
    * plus /q and /search/archive rows so the per-source rule and the
    * nested allow both fire). */
  def hostPath(docId: Column): Column = {
    val p = (docId % 7).cast("string")
    when(docId % 6 === 0, concat(lit("/search/archive/"), p))
      .when(docId % 6 === 1, concat(lit("/search/"), p))
      .when(docId % 6 === 2, concat(lit("/api/v2/open/"), p))
      .when(docId % 6 === 3, concat(lit("/q/"), p))
      .when(docId % 6 === 4, concat(lit("/private/"), p))
      .otherwise(concat(lit("/articles/"), p))
  }

  /** Graded query: the robots gate driven by PARSED per-host policies —
    * each source's robots.txt body parses to its own rule set (a frame,
    * one row per (source, prefix, allow)), frontier paths join their
    * OWN host's rules, and the RFC 9309 longest-match argmax decides;
    * paths matching NO rule default to allow with matched_rule ''
    * (RFC: no match → allow — note graftbot's group has no `/private`
    * rule, so `/private/...` is ALLOWED here; the `*` group must not
    * leak). Scale shape: the rule frame is one flatMap over DISTINCT
    * sources (hosts × rules, tiny next to the corpus — broadcast side),
    * the gate one equi-join on source + the integer argmax; no window.
    * Rows: (doc_id, source, path, matched_rule, allowed). */
  def robotsParsedDecisions(docs: DataFrame, agent: String = "graftbot",
                            idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ruleRows = docs.select(col("source")).distinct()
      .withColumn("robots_txt", robotsTxtOf(col("source")))
      .as[(String, String)]
      .flatMap { case (src, txt) =>
        parseRobots(txt, agent).map { case (p, a) => (src, p, a) }
      }
      .toDF("source", "prefix", "allow")
    val paths = docs.select(col(idCol), col("source"),
      hostPath(col(idCol)).as("path"))
    paths
      .join(broadcast(ruleRows),
        paths("source") === ruleRows("source") &&
          col("path").startsWith(col("prefix")), "left")
      .groupBy(col(idCol), paths("source"), col("path"))
      .agg(max(struct((length(col("prefix")) * 2 + col("allow")).as("key"),
        col("prefix"), col("allow"))).as("__w"))
      .select(col(idCol), col("source"), col("path"),
        coalesce(col("__w.prefix"), lit("")).as("matched_rule"),
        coalesce(col("__w.allow") === 1, lit(true)).as("allowed"))
      .orderBy(idCol)
  }

  /** RFC 9309 §2.2.3 PATTERN rules — the `*`/`$` forms the prefix gate
    * above declares out of scope, closed here: `*` matches any octet
    * sequence, a TRAILING `$` anchors the rule to the path end, and a
    * rule without `$` is a prefix match. Translation to an RE2-safe
    * regex: every regex metacharacter escaped, `*` → `.*`, `^` anchor
    * always, `$` only when the rule ends with it. Precedence stays "most
    * octets of the RULE, allow wins ties" — the same integer key, so
    * literal and wildcard rules rank on one scale. */
  def robotsPatternRegex(rule: String): String = {
    val (body, anchored) =
      if (rule.endsWith("$")) (rule.dropRight(1), true) else (rule, false)
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()+-?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }

  /** The wildcard-rule fixture: an end-anchored extension block, a
    * mid-rule `*`, and a LITERAL rule that the wildcard allow must
    * out-rank on `/api/…/open` paths (cross-kind precedence). */
  val WildcardRules: Seq[(String, Int)] = Seq(
    ("/*.json$", 0), ("/api/*/open", 1), ("/api", 0), ("/tmp", 0))

  /** Deterministic path fixture for the pattern gate: a `.json` path the
    * anchored rule blocks, a `.json.bak` path it must NOT block (the
    * `$` is load-bearing), an `/api/…/open` path where the wildcard
    * allow out-ranks the literal `/api` disallow, a plain `/tmp` block,
    * and an `/api/…/closed` path only the literal rule catches. */
  def wildcardPath(docId: Column): Column = {
    val p = (docId % 7).cast("string")
    when(docId % 5 === 0, concat(lit("/files/f"), p, lit(".json")))
      .when(docId % 5 === 1, concat(lit("/files/f"), p, lit(".json.bak")))
      .when(docId % 5 === 2, concat(lit("/api/v"), p, lit("/open/x")))
      .when(docId % 5 === 3, concat(lit("/tmp/t"), p))
      .otherwise(concat(lit("/api/v"), p, lit("/closed")))
  }

  /** Graded query: the robots gate under PATTERN rules — each rule rides
    * the join as its compiled regex (tiny broadcast side; the regex
    * evaluates per candidate pair), the argmax key is unchanged
    * (rule-octet length ·2 + allow), no-match defaults to allow.
    * Rows: (doc_id, path, matched_rule, allowed). */
  def robotsWildcardDecisions(docs: DataFrame,
                              idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = WildcardRules
      .map { case (r, a) => (r, robotsPatternRegex(r), a, r.length * 2 + a) }
      .toDF("rule", "rx", "allow", "key")
    val paths = docs.select(col(idCol), wildcardPath(col(idCol)).as("path"))
    paths
      .join(broadcast(rules), expr("path rlike rx"), "left")
      .groupBy(col(idCol), col("path"))
      .agg(max(struct(col("key"), col("rule"), col("allow"))).as("__w"))
      .select(col(idCol), col("path"),
        coalesce(col("__w.rule"), lit("")).as("matched_rule"),
        coalesce(col("__w.allow") === 1, lit(true)).as("allowed"))
      .orderBy(idCol)
  }

  /** Graded query: politeness scheduling driven by the PARSED
    * Crawl-delay — the composition that ties the robots parser to the
    * wave scheduler: each source's delay (from ITS OWN robots.txt's
    * selected group — the decoy group's delay must not leak) sets the
    * per-wave budget (slots = 3 − delay: a 1-second host takes two
    * fetches per wave, a 2-second host one), the PARSED per-host rules
    * gate which paths are fetchable at all, and allowed paths rank FIFO
    * per source. One host-partitioned window over the gated frame plus
    * a broadcast of the host-bounded delay table. Rows:
    * (doc_id, source, path, slots, slot, wave). */
  def politenessByDelay(docs: DataFrame, agent: String = "graftbot",
                        idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val delays = docs.select(col("source")).distinct()
      .withColumn("robots_txt", robotsTxtOf(col("source")))
      .as[(String, String)]
      .map { case (src, txt) =>
        (src, 3L - parseCrawlDelay(txt, agent).getOrElse(1))
      }
      .toDF("source", "slots")
    val allowed = robotsParsedDecisions(docs, agent, idCol)
      .filter(col("allowed"))
      .select(col(idCol), col("source"), col("path"))
    val w = Window.partitionBy(col("source")).orderBy(col(idCol), col("path"))
    allowed.join(broadcast(delays), Seq("source"))
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("wave", expr("(slot - 1) div slots"))
      .select(col(idCol), col("source"), col("path"), col("slots"),
        col("slot"), col("wave"))
      .orderBy(idCol)
  }

  /** Graded query: canonicalize every manifest URL and group — each row
    * carries its canonical form, the size of its canonical group and
    * the keep/drop decision (keep = smallest id of the group). */
  def urlDedup(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val withUrl = docs.select(col(idCol), syntheticUrl(col(idCol)).as("url"))
      .withColumn("canonical_url", canonicalizeUrl(col("url")))
    val groups = withUrl.groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_dupes"), min(col(idCol)).as("__keep"))
    withUrl.join(groups, Seq("canonical_url"))
      .select(col(idCol), col("url"), col("canonical_url"), col("n_dupes"),
        (col(idCol) === col("__keep")).as("keep"))
      .orderBy(idCol)
  }
}
