package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Html

/** HTML→text extraction: the hand-verifiable hard parts — entity decode
  * order, script bodies carrying fake close-tags, comment stripping,
  * the nav-chrome link-density threshold on BOTH sides of 500‰, and
  * composition into the boilerplate-strip stage. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "html")

  private def extractText(html: String): String =
    Html.extract(docs(1L -> html)).select("text").as[String].head()

  test("entity decode order: &amp; last, so double-escaped text survives") {
    // &amp;lt; must decode to the literal text "&lt;", NOT to "<"
    assert(extractText("<p>a &amp;lt; b</p>") == "a &lt; b")
    assert(extractText("<p>x &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;y &amp; z</p>")
      == "x <tag> \"q\" 's' y & z")
  }

  test("script/style bodies with fake close-tags strip wholesale, first") {
    // the fake </p> inside the script must NOT become a block break,
    // and the a<b must not be eaten as a tag
    val t = extractText(
      "<p>before</p><script>if (a<b) { s = \"</p>\"; }</script><p>after</p>")
    assert(t == "before\nafter", t)
    assert(extractText("<style>p { content: \"</p>\"; }</style><p>kept</p>") == "kept")
    assert(extractText("<p>x<!-- <p>never</p> -->y</p>") == "xy")
  }

  test("block structure: block tags separate, inline tags vanish") {
    val t = extractText(
      "<h1>Title</h1><p>one <em>two</em> three</p><div>four</div>")
    assert(t == "Title\none two three\nfour", t)
  }

  test("nav threshold sits at 500 permille, both sides exercised") {
    // block 1: 12 anchor chars of 24 → exactly 500 → is_nav
    // block 2: 11 anchor chars of 24 → 458 → not nav
    val b = Html.blocks(docs(
      1L -> ("<div><a href='/'>abcdefghijkl</a>mnopqrstuvwx</div>" +
             "<div><a href='/'>abcdefghijk</a>lmnopqrstuvwx</div>")))
      .orderBy("block_id")
      .select("block_text", "n_chars", "link_chars", "link_density_scaled", "is_nav")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(b.map(_._2) == Seq(24L, 24L))
    assert(b.map(_._3) == Seq(12L, 11L))
    assert(b.map(_._4) == Seq(500L, 458L))
    assert(b.map(_._5) == Seq(true, false))
  }

  test("block ids keep gaps where empty blocks were dropped") {
    val b = Html.blocks(docs(1L -> "<p>a</p><p></p><p>b</p>"))
      .orderBy("block_id").select("block_id", "block_text")
      .as[(Long, String)].collect().toSeq
    // raw split: ["", "a", "", "", "", "b", ""] → kept at positions 2 and 6
    assert(b == Seq((2L, "a"), (6L, "b")), b)
  }

  test("extract report counts: blocks, links, link chars") {
    val r = Html.extract(docs(1L ->
      ("<h1>T</h1><p>body text here</p>" +
       "<div><a href='/a'>one</a> <a href='/b'><em>two</em> words</a></div>")))
      .select("n_blocks", "n_links", "link_chars")
      .as[(Long, Long, Long)].head()
    // blocks: "T", "body text here", "one two words"; links: 2;
    // anchor chars: "one"(3) + "two words"(9)
    assert(r == ((3L, 2L, 12L)), r)
  }

  test("link resolution: every href class against a hand-resolved base") {
    val base = "https://w.example/docs/d3/page.html"
    val html = "<p><a href=\"https://x.example/abs#frag\">a</a>" +
      "<a href=\"//cdn.example/c\">b</a>" +
      "<a href=\"/root\">c</a>" +
      "<a href=\"rel/r.html\">d</a>" +
      "<a href=\"#top\">e</a></p>" +
      "<script>var s = '<a href=\"/never\">x</a>';</script>" // stripped first
    val rows = Html.links(Seq((1L, base, html)).toDF("doc_id", "base_url", "html"))
      .orderBy("link_id")
      .select("link_id", "href", "url", "host", "is_internal", "anchor_text")
      .as[(Long, String, String, String, Boolean, String)].collect().toSeq
    assert(rows == Seq(
      (1L, "https://x.example/abs#frag", "https://x.example/abs", "x.example", false, "a"),
      (2L, "//cdn.example/c", "https://cdn.example/c", "cdn.example", false, "b"),
      (3L, "/root", "https://w.example/root", "w.example", true, "c"),
      (4L, "rel/r.html", "https://w.example/docs/d3/rel/r.html", "w.example", true, "d"),
      (5L, "#top", base, "w.example", true, "e")), rows)
  }

  test("head metadata: attr order free, script-shadowed title ignored, absence empty") {
    val html = "<html><head><title> A&amp;B </title>" +
      "<meta content=\"d1\" name=\"description\">" + // content FIRST
      "<meta name=\"keywords\" content=\"skip\">" +
      "<meta property=\"og:title\" content=\"og&quot;x\">" +
      "<link rel=\"canonical\" href=\"https://h.example/c\">" +
      "</head><body><script>t=\"<title>fake</title>\";</script></body></html>"
    val r = Html.meta(Seq((1L, html)).toDF("doc_id", "html"))
      .select("title", "description", "og_title", "canonical")
      .as[(String, String, String, String)].head()
    assert(r == (("A&B", "d1", "og\"x", "https://h.example/c")), r)
    // nothing in the head: all empty strings, never null
    val empty = Html.meta(Seq((2L, "<html><body>x</body></html>"))
      .toDF("doc_id", "html"))
      .select("title", "description", "og_title", "canonical")
      .as[(String, String, String, String)].head()
    assert(empty == (("", "", "", "")))
  }

  test("extracted frontier composes into URL canonicalization") {
    // resolved links feed the same canonicalizer dedup_urls grades:
    // tracking params and fragments must collapse variants together
    val base = "https://w.example/a/page.html"
    val html = "<a href=\"/x?utm_source=t\">1</a><a href=\"/x\">2</a>" +
      "<a href=\"/x#sec\">3</a>"
    val urls = Html.links(Seq((1L, base, html)).toDF("doc_id", "base_url", "html"))
      .select(col("url"), ext.Urls.canonicalizeUrl(col("url")).as("canon"))
      .as[(String, String)].collect().toSeq
    assert(urls.map(_._2).distinct.size == 1, urls) // all three collapse
  }

  test("extraction composes into the boilerplate strip stage") {
    // extract over the planted corpus, then re-run the CCNet-style
    // boilerplate strip on the EXTRACTED text: the planted nav chrome
    // ("Home Next page") repeats across every document, so it must be
    // a dropped sentence for every doc once sentences are planted
    val dir = "/root/testdata/sf0.001"
    val base = Tables.documents(spark, dir).filter(col("doc_id") < 50)
    val n = base.count()
    val extracted = Html.extract(Html.htmlDocs(base))
      .select(col("doc_id"), regexp_replace(col("text"), "\n", " . ").as("text"))
    val stripped = ext.TextStats.stripBoilerplate(extracted).cache()
    assert(stripped.count() == n)
    // the planted nav chrome repeats in every doc → always boilerplate
    assert(stripped.filter(col("n_dropped") >= 1).count() == n)
    assert(stripped.filter(col("clean_text").contains("Home Next page")).count() == 0)
    // body prose survives except for planted exact-duplicate documents
    assert(stripped.filter(length(col("clean_text")) > 0).count() >= n / 2)
  }
}
