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
