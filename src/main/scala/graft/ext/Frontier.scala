package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The FRONTIER side of a crawler — the composition the content side
  * (`pipeline_crawl_corpus`) left open: extracted links and sitemap
  * entries are canonicalized, gated by the robots rules, and deduped
  * into the fetch frontier. The composition order is where real
  * crawlers break, and this chain pins the two classic mistakes:
  *
  *  1. the robots decision applies to the CANONICALIZED path — a link
  *     arriving as `HTTPS://WWW.host:443/search/3/` must be blocked by
  *     the `/search` rule even though the raw href never starts with
  *     it;
  *  2. sitemap entries pass through the SAME gate as extracted links —
  *     a sitemap is a hint, not an override, and a robots-blocked
  *     sitemap entry must never reach the frontier (RFC 9309 §2.3
  *     precedence; the fixture plants one).
  *
  * Scale shape: link extraction and sitemap parsing are per-row
  * projections (zero shuffle, same plans as `text_html_links` /
  * `url_sitemap`); the robots gate is a CLOSED-FORM when-chain over the
  * static rule set ([[Urls.robotsRuleExpr]] — no join, no window, stays
  * inside whole-stage codegen); the only exchange in the chain is the
  * ONE hash aggregation on `canonical_url` that builds the frontier —
  * exactly the dedup a 100-TB crawl must shuffle for anyway, keyed on
  * the high-cardinality URL so it salts/AQE-splits cleanly. */
object Frontier {

  /** Deterministic frontier link fixture (closed-form in the id,
    * mirrored verbatim by the oracle): each doc's page carries anchors
    * exercising every frontier hazard — a canonicalization-DIVERGENT
    * absolute pair (cased + www + default port + trailing slash vs the
    * clean form — they must collapse to one frontier row), a
    * tracking-junk root-relative link, a robots-blocked `/search` link,
    * the nested allow-inside-disallow pair (`/private/pub` allowed,
    * `/private/cache` blocked), a directory-relative link, and a
    * trailing-slash `/q/` link that must collide with the sitemap's
    * clean `/q` entry across sources. */
  def frontierLinkDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("base_url",
        concat(lit("https://"), col("source"), lit(".example/docs/d"),
          (col(idCol) % 20).cast("string"), lit("/page.html")))
      .withColumn("html", concat(
        lit("<html><body><p><a href=\"HTTPS://WWW.Ext"), (col(idCol) % 7).cast("string"),
        lit(".EXAMPLE:443/a/\">dup cased</a> "),
        lit("<a href=\"https://ext"), (col(idCol) % 7).cast("string"),
        lit(".example/a\">dup clean</a> "),
        lit("<a href=\"/p/"), (col(idCol) % 50).cast("string"),
        lit("?utm_source=feed&utm_campaign=x\">tracked</a> "),
        lit("<a href=\"/search/"), (col(idCol) % 7).cast("string"),
        lit("\">blocked</a> "),
        lit("<a href=\"/private/pub/"), (col(idCol) % 7).cast("string"),
        lit("\">nested allow</a> "),
        lit("<a href=\"/private/cache/"), (col(idCol) % 7).cast("string"),
        lit("\">nested block</a> "),
        lit("<a href=\"sub/"), (col(idCol) % 10).cast("string"),
        lit(".html#sec\">rel</a> "),
        lit("<a href=\"/q/"), (col(idCol) % 20).cast("string"),
        lit("/\">listing</a></p></body></html>")))

  /** Deterministic frontier sitemap fixture: a clean `/q` entry (the
    * cross-source collision partner of the link fixture's `/q/…/`), a
    * robots-BLOCKED `/search/s…` entry (must vanish at the gate), a
    * www + tracking-param `/api/v2/open` entry (the deep allow-override
    * rule, reached only after canonicalization), and an `/api/private`
    * entry blocked by the shorter `/api` rule. */
  def frontierSitemapDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("sitemap_xml", concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      lit("<url><loc>https://"), col("source"), lit(".example/q/"),
      (col(idCol) % 20).cast("string"), lit("</loc></url>"),
      lit("<url><loc>https://"), col("source"), lit(".example/search/s"),
      (col(idCol) % 9).cast("string"), lit("</loc></url>"),
      lit("<url><loc>https://www."), col("source"),
      lit(".example/api/v2/open/"), (col(idCol) % 7).cast("string"),
      lit("?utm_medium=rss</loc></url>"),
      lit("<url><loc>https://"), col("source"), lit(".example/api/private/x"),
      (col(idCol) % 4).cast("string"), lit("</loc></url>"),
      lit("</urlset>")))

  private def pathOf(canonical: Column): Column = {
    val p = regexp_extract(canonical, "^https?://[^/?#]*([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** The pre-dedup candidate stream: links + sitemap entries,
    * canonicalized and robots-gated — every stage a per-row projection
    * (Generate + when-chain, no join/agg), so the SAME derivation runs
    * unchanged over a STREAMING frame (the maintained-frontier drain).
    * Rows: (idCol, url, via_sitemap, canonical_url, path, __rule). */
  def candidates(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val links = Html.links(frontierLinkDocs(docs, idCol), idCol = idCol)
      .select(col(idCol), col("url"), lit(0L).as("via_sitemap"))
    val sitemap = Urls.sitemapEntries(frontierSitemapDocs(docs, idCol), idCol = idCol)
      .select(col(idCol), col("loc").as("url"), lit(1L).as("via_sitemap"))
    links.unionByName(sitemap)
      .withColumn("canonical_url", Urls.canonicalizeUrl(col("url")))
      .withColumn("path", pathOf(col("canonical_url")))
      .withColumn("__rule", Urls.robotsRuleExpr(col("path")))
  }

  /** The graded chain: [[Html.links]] → [[Urls.canonicalizeUrl]] →
    * [[Urls.robotsRuleExpr]] gate on the canonical path → sitemap union
    * ([[Urls.sitemapEntries]], same gate) → frontier dedup (one row per
    * allowed canonical URL; `first_doc` = min referrer, provenance
    * flags per side). Rows:
    * (canonical_url, path, matched_rule, first_doc, n_refs,
    *  from_link, from_sitemap). */
  def crawlFrontier(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    candidates(docs, idCol)
      .filter(col("__rule.allow") === 1)
      .groupBy(col("canonical_url"), col("path"),
        col("__rule.prefix").as("matched_rule"))
      .agg(min(col(idCol)).as("first_doc"),
        count(lit(1)).as("n_refs"),
        max(col("via_sitemap") === 0L).as("from_link"),
        max(col("via_sitemap") === 1L).as("from_sitemap"))
      .orderBy("canonical_url")
  }

  /** Closed-form FETCHED page for one frontier URL (the "fetch" stage
    * of the crawl loop): a deeper same-host link (`/next` + path), a
    * robots-BLOCKED link, the cross-page hub link every page carries,
    * and a SELF link back to the fetched URL (the classic loop trap —
    * wave 2 must drop it against the wave-1 seen-set). */
  def fetchedHtml(canonicalUrl: Column, path: Column): Column = concat(
    lit("<html><body><p>fetched "), path, lit("</p>"),
    lit("<a href=\"/next"), path, lit("\">deeper</a> "),
    lit("<a href=\"/search/again\">blocked</a> "),
    lit("<a href=\"https://hub.example/home\">hub</a> "),
    lit("<a href=\""), canonicalUrl, lit("\">self</a>"),
    lit("</body></html>"))

  /** The full crawl LOOP, one cycle in one declarative plan: the wave-1
    * frontier (the graded `pipeline_crawl_frontier` chain) → FETCH
    * (closed-form page per allowed URL) → link extraction against each
    * page's own base URL → canonicalize → the SAME robots gate → wave-2
    * dedup MINUS the wave-1 seen-set (a left anti join — the batch form
    * of `stream_frontier`'s dropDuplicates state). The loop hazards
    * under grade: a self-link must die against the seen-set, the
    * blocked deeper link at the gate, and the hub link every page
    * carries must collapse to ONE wave-2 row whose n_refs is the whole
    * wave-1 population.
    *
    * Scale shape: wave 1's agg + one anti-join on the canonical URL +
    * wave 2's agg — all keyed on the high-cardinality URL; the fetch
    * and extraction stages are per-row projections. */
  def crawlCycle(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val wave1 = crawlFrontier(docs, idCol)
      .select(col("canonical_url"), col("path"))
    val pages = wave1
      .withColumn("page_id", xxhash64(col("canonical_url")))
      .withColumn("base_url", col("canonical_url"))
      .withColumn("html", fetchedHtml(col("canonical_url"), col("path")))
    val cand2 = Html.links(pages, htmlCol = "html", baseCol = "base_url",
        idCol = "page_id")
      .select(col("url"))
      .withColumn("canonical_url", Urls.canonicalizeUrl(col("url")))
      .withColumn("path", pathOf(col("canonical_url")))
      .withColumn("__rule", Urls.robotsRuleExpr(col("path")))
      .filter(col("__rule.allow") === 1)
    cand2
      .join(wave1.select(col("canonical_url")), Seq("canonical_url"), "left_anti")
      .groupBy(col("canonical_url"), col("path"),
        col("__rule.prefix").as("matched_rule"))
      .agg(count(lit(1)).as("n_refs"))
      .orderBy("canonical_url")
  }

  /** Politeness scheduling over the deduped frontier — the step between
    * "what may we fetch" and "when": a crawler must not hammer one
    * host, so fetches are issued in WAVES of at most `perHostSlots`
    * URLs per host. Deterministic queue discipline: per host, URLs
    * rank by (first_doc, canonical_url) — earliest-discovered first,
    * URL as the total-order tie-break — and wave = (rank−1) div slots.
    *
    * Scale shape: ONE window partitioned by host (host-keyed exchange —
    * high-cardinality at crawl scale, so it spreads; never a global
    * sort or SinglePartition: PlanSpec-asserted). The wave arithmetic
    * is a projection. Rows: (canonical_url, host, first_doc, slot,
    * wave). */
  def politenessWaves(docs: DataFrame, perHostSlots: Int = 2,
                      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frontier = crawlFrontier(docs, idCol)
      .withColumn("host",
        regexp_extract(col("canonical_url"), "^https?://([^/]+)", 1))
    val w = Window.partitionBy(col("host"))
      .orderBy(col("first_doc"), col("canonical_url"))
    frontier
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("wave", expr(s"(slot - 1) div $perHostSlots"))
      .select("canonical_url", "host", "first_doc", "slot", "wave")
      .orderBy("canonical_url")
  }
}
