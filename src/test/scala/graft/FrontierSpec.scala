package graft

import org.apache.spark.sql.functions._
import graft.ext.{Frontier, Urls}

/** The frontier-side crawl composition: links + sitemap →
  * canonicalize → robots gate on the CANONICAL path → frontier dedup.
  * The planted hazards (robots-blocked sitemap entry, a
  * canonicalization-divergent link pair) are asserted here; the full
  * frame is hash-graded against the DuckDB oracle. */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val frontier = Frontier.crawlFrontier(docs).cache()

  test("robots-blocked sitemap entries never reach the frontier") {
    // the fixture plants /search/s{id%9} in every sitemap and
    // /search/{id%7} as a link; the /search disallow must gate BOTH
    // sides — a sitemap is a hint, not a robots override
    assert(frontier.filter(col("path").startsWith("/search")).count() == 0)
    // and the blocked /private/cache and /api/private plants too
    assert(frontier.filter(col("path").startsWith("/private/cache")).count() == 0)
    assert(frontier.filter(col("path").startsWith("/api/private")).count() == 0)
  }

  test("nested allow-overrides survive the gate via longest-match") {
    val pub = frontier.filter(col("path").startsWith("/private/pub"))
    assert(pub.count() > 0)
    assert(pub.select("matched_rule").distinct().as[String].collect()
      .toSeq == Seq("/private/pub"))
    val api = frontier.filter(col("path").startsWith("/api/v2/open"))
    assert(api.count() > 0)
    // the sitemap's www + utm_medium form landed canonicalized
    assert(api.filter(col("canonical_url").contains("www.") ||
      col("canonical_url").contains("utm_")).count() == 0)
  }

  test("canonicalization-divergent link pair collapses to one frontier row") {
    // every doc plants HTTPS://WWW.Ext{k}.EXAMPLE:443/a/ AND
    // https://ext{k}.example/a — same resource, one frontier row, both
    // references counted
    val dup = frontier.filter(col("path") === "/a")
      .select("canonical_url", "n_refs").as[(String, Long)].collect()
    assert(dup.nonEmpty && dup.forall(_._1.matches("https://ext\\d\\.example/a")))
    val nDocs = docs.count()
    assert(dup.map(_._2).sum == 2 * nDocs) // both forms of every doc counted
  }

  test("cross-source collision: the link /q/.../ and sitemap /q/... merge") {
    val q = frontier.filter(col("path").startsWith("/q/"))
    assert(q.count() > 0)
    val flags = q.select("from_link", "from_sitemap")
      .as[(Boolean, Boolean)].collect()
    assert(flags.forall { case (l, s) => l && s })
  }

  test("robotsRuleExpr agrees with the broadcast-argmax robotsDecisions") {
    // same winner on every synthetic frontier path — the closed-form
    // when-chain and the graded join formulation are one semantics
    val viaJoin = Urls.robotsDecisions(docs)
      .select(col("path"), col("matched_rule"), col("allowed"))
    val viaExpr = docs
      .select(Urls.syntheticPath(col("doc_id")).as("path"))
      .select(col("path"), Urls.robotsRuleExpr(col("path")).as("r"))
      .select(col("path"), col("r.prefix").as("matched_rule"),
        (col("r.allow") === 1).as("allowed"))
      .distinct()
    assert(viaJoin.distinct().exceptAll(viaExpr).count() == 0)
    assert(viaExpr.exceptAll(viaJoin.distinct()).count() == 0)
  }

  test("politeness waves: per-host FIFO, bounded wave occupancy, frontier-complete") {
    val waves = Frontier.politenessWaves(docs, perHostSlots = 2)
      .select("canonical_url", "host", "first_doc", "slot", "wave")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // every allowed frontier URL is scheduled exactly once
    assert(waves.map(_._1).sorted ==
      frontier.select("canonical_url").as[String].collect().toSeq.sorted)
    // per host: slots are 1..n contiguous, FIFO by (first_doc, url),
    // and no wave holds more than perHostSlots fetches
    for ((host, rows) <- waves.groupBy(_._2)) {
      val bysSlot = rows.sortBy(_._4)
      assert(bysSlot.map(_._4) == (1L to rows.size.toLong),
        s"$host slots not contiguous")
      assert(bysSlot == rows.sortBy(r => (r._3, r._1)),
        s"$host not FIFO by (first_doc, canonical_url)")
      assert(rows.groupBy(_._5).values.forall(_.size <= 2),
        s"$host overfilled a wave")
      assert(bysSlot.map(_._5) == bysSlot.map(r => (r._4 - 1) / 2),
        s"$host wave arithmetic drifted")
    }
  }

  test("robots.txt parse: group selection, no-merge, case, comments, empty disallow") {
    val txt =
      """# policy
        |User-agent: otherbot
        |Disallow: /
        |
        |User-Agent: graftbot
        |User-agent: graftbot-img
        |disallow: /search
        |Allow: /search/archive
        |Disallow: /api # trailing comment
        |Disallow:
        |Sitemap: https://x.example/s.xml
        |
        |User-agent: *
        |Disallow: /private
        |""".stripMargin
    // exact-name group wins; its rules only (never merged with *)
    assert(Urls.parseRobots(txt, "graftbot") ==
      Seq(("/search", 0), ("/search/archive", 1), ("/api", 0)))
    // consecutive User-agent lines share ONE group
    assert(Urls.parseRobots(txt, "graftbot-img") ==
      Urls.parseRobots(txt, "graftbot"))
    // agent matching is case-insensitive
    assert(Urls.parseRobots(txt, "GraftBot") ==
      Urls.parseRobots(txt, "graftbot"))
    // unknown agent falls to the * group — NOT to otherbot's
    assert(Urls.parseRobots(txt, "strangebot") == Seq(("/private", 0)))
    // the decoy group is reachable by its own name
    assert(Urls.parseRobots(txt, "otherbot") == Seq(("/", 0)))
    // no groups at all: allow-all
    assert(Urls.parseRobots("Sitemap: https://x/s.xml", "graftbot") == Nil)
    // a named group with zero rules is still SELECTED (allow-all),
    // shielding the agent from the * group
    val shielded = "User-agent: graftbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert(Urls.parseRobots(shielded, "graftbot") == Nil)
  }

  test("parsed robots gate: * group never leaks into the named group's decisions") {
    val got = Urls.robotsParsedDecisions(docs)
      .select("doc_id", "path", "matched_rule", "allowed")
      .as[(Long, String, String, Boolean)].collect()
    // /private paths: graftbot's group has NO /private rule, so RFC
    // no-match default-allow applies — the * group must not leak
    val priv = got.filter(_._2.startsWith("/private"))
    assert(priv.nonEmpty && priv.forall(r => r._3 == "" && r._4))
    // nested allow fires through the parsed rules
    val arch = got.filter(_._2.startsWith("/search/archive"))
    assert(arch.nonEmpty && arch.forall(r => r._3 == "/search/archive" && r._4))
    val search = got.filter(r => r._2.startsWith("/search/") &&
      !r._2.startsWith("/search/archive"))
    assert(search.nonEmpty && search.forall(r => r._3 == "/search" && !r._4))
  }

  test("crawl cycle: self-links die at the seen-set, blocked links at the gate, hub collapses") {
    val wave1 = frontier.select("canonical_url").as[String].collect().toSet
    val wave2 = Frontier.crawlCycle(docs)
      .select("canonical_url", "path", "n_refs")
      .as[(String, String, Long)].collect().toSeq
    // no wave-2 URL was already fetched in wave 1 (the self-link trap)
    assert(wave2.forall(r => !wave1.contains(r._1)))
    // the blocked deeper link never appears
    assert(!wave2.exists(_._2.startsWith("/search")))
    // every page's unique deeper link survives with exactly one referrer
    val nexts = wave2.filter(_._2.startsWith("/next"))
    assert(nexts.size == wave1.size && nexts.forall(_._3 == 1L))
    // the hub link every page carries collapses to ONE row whose
    // referrer count is the whole wave-1 population
    val hub = wave2.filter(_._1 == "https://hub.example/home")
    assert(hub.size == 1 && hub.head._3 == wave1.size.toLong)
    assert(wave2.size == wave1.size + 1)
  }

  test("robots pattern translation: *, $, metacharacter escaping") {
    assert(Urls.robotsPatternRegex("/*.json$") == "^/.*\\.json$")
    assert(Urls.robotsPatternRegex("/api/*/open") == "^/api/.*/open")
    assert(Urls.robotsPatternRegex("/tmp") == "^/tmp")
    // a path that IS regex-hostile must be escaped, not interpreted
    assert(Urls.robotsPatternRegex("/a+b(c)?") == "^/a\\+b\\(c\\)\\?")
    // $ mid-rule is literal (only a trailing $ anchors)
    assert(Urls.robotsPatternRegex("/x$y") == "^/x\\$y")
    // behavioral checks
    def m(rule: String, path: String): Boolean =
      java.util.regex.Pattern.compile(Urls.robotsPatternRegex(rule))
        .matcher(path).find()
    assert(m("/*.json$", "/files/a.json"))
    assert(!m("/*.json$", "/files/a.json.bak")) // the anchor is load-bearing
    assert(m("/api/*/open", "/api/v3/open/x"))  // prefix semantics w/o $
    assert(!m("/api/*/open", "/api/v3/closed"))
  }

  test("crawl-delay: selected group's value only; drives the wave budget") {
    val txt = "User-agent: otherbot\nCrawl-delay: 99\nDisallow: /\n\n" +
      "User-agent: graftbot\nCrawl-delay: 2\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 7\n"
    assert(Urls.parseCrawlDelay(txt, "graftbot").contains(2)) // not 99, not 7
    assert(Urls.parseCrawlDelay(txt, "strangebot").contains(7)) // * group
    assert(Urls.parseCrawlDelay("User-agent: g\nDisallow: /", "g").isEmpty)
    // non-numeric delays are tolerated and ignored
    assert(Urls.parseCrawlDelay("User-agent: g\nCrawl-delay: fast\n", "g").isEmpty)
    // the composed schedule: per source, slots = 3 - parsed delay, FIFO,
    // no wave overfilled, and only parsed-gate-allowed paths scheduled
    val sched = Urls.politenessByDelay(docs)
      .select("source", "path", "slots", "slot", "wave")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(sched.nonEmpty)
    for ((src, rows) <- sched.groupBy(_._1)) {
      val digit = src.replaceAll("[^0-9]", "").toInt
      val slots = 2L - digit % 2
      assert(rows.forall(_._3 == slots), s"$src slots")
      val ordered = rows.sortBy(_._4)
      assert(ordered.map(_._4) == (1L to rows.size.toLong), s"$src slots contiguous")
      assert(rows.groupBy(_._5).values.forall(_.size <= slots), s"$src overfilled")
    }
    assert(!sched.exists(r => r._2.startsWith("/search/") &&
      !r._2.startsWith("/search/archive")))
  }

  test("uppercase-scheme absolute hrefs resolve absolute (RFC 3986 §3.1)") {
    val links = ext.Html.links(
      Seq((1L, "https://a.example/d/page.html",
        "<a href=\"HTTPS://B.Example/x\">t</a>"))
        .toDF("doc_id", "base_url", "html"))
    val url = links.select("url").as[String].head()
    assert(url == "HTTPS://B.Example/x") // verbatim, NOT base-joined
    assert(Seq(url).toDF("u")
      .select(Urls.canonicalizeUrl(col("u"))).as[String].head() ==
      "https://b.example/x")
  }
}
