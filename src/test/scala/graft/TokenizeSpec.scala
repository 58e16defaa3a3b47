package graft

import graft.text.Tokenize
import org.apache.spark.sql.functions._

/** Table-driven tokenizer parity tests — the §1.4 rules, including the
  * cases the reference goldens pin down: Unicode letters survive
  * (`protégé` appears in final_wc.txt), digits survive (`430zip`),
  * underscores are deleted, pure-punctuation tokens are KEPT as "". */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(explode(Tokenize.tokensArray(col("text"))).as("w"))
      .as[String].collect().toSeq

  test("basic split + lowercase + punctuation strip") {
    assert(toks("Hello, World!") == Seq("hello", "world"))
  }
  test("pure punctuation token is kept as empty string") {
    assert(toks("foo — bar") == Seq("foo", "", "bar"))
  }
  test("unicode letters survive") {
    assert(toks("protégé.") == Seq("protégé"))
  }
  test("digits survive") {
    assert(toks("430zip 202") == Seq("430zip", "202"))
  }
  test("underscore deleted") {
    assert(toks("foo_bar") == Seq("foobar"))
  }
  test("mixed whitespace runs, leading/trailing") {
    assert(toks("  a\t\tb\nc  ") == Seq("a", "b", "c"))
  }
  test("empty text yields no tokens") {
    assert(toks("") == Seq.empty)
  }

  test("sentence segmentation: boundary decisions") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def sents(t: String): Seq[(Long, String, Long)] =
      graft.ext.TextStats.sentences(Seq((0L, t)).toDF("doc_id", "text"))
        .select(col("sent_idx"), col("sentence"), col("n_chars"))
        .as[(Long, String, Long)].collect().toSeq
    // plain boundary: terminator stays, whitespace consumed
    assert(sents("One. Two. Three") ==
      Seq((1L, "One.", 4L), (2L, "Two.", 4L), (3L, "Three", 5L)))
    // terminator RUN is one boundary
    assert(sents("Hi!? Next") == Seq((1L, "Hi!?", 4L), (2L, "Next", 4L)))
    // terminator without following whitespace is NOT a boundary (3.14)
    assert(sents("Pi is 3.14 ok") == Seq((1L, "Pi is 3.14 ok", 13L)))
    // trailing terminator: no empty trailing sentence, index gap kept
    assert(sents("End. ") == Seq((1L, "End.", 4L)))
    assert(sents("A. B.") == Seq((1L, "A.", 2L), (2L, "B.", 2L)))
    // no terminator -> whole doc is one sentence; empty doc -> none
    assert(sents("no punctuation here") == Seq((1L, "no punctuation here", 19L)))
    assert(sents("") == Seq.empty)
    // newline and tab count as boundary whitespace
    assert(sents("A.\nB!\tC") == Seq((1L, "A.", 2L), (2L, "B!", 2L), (3L, "C", 1L)))
  }

  test("token drift: hand-computed ppm deltas, appearing/vanishing words") {
    import spark.implicits._
    val oldC = Seq((0L, "aa aa bb"), (1L, "aa cc")).toDF("doc_id", "text")   // aa:3 bb:1 cc:1, T=5
    val newC = Seq((0L, "aa bb bb"), (1L, "bb dd")).toDF("doc_id", "text")   // aa:1 bb:3 dd:1, T=5
    val out = graft.ext.TextStats.tokenDrift(oldC, newC, k = 10)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val m = out.map(r => r._1 -> r).toMap
    assert(m("aa") == (("aa", 3L, 1L, 600000L, 200000L, -400000L)))
    assert(m("bb") == (("bb", 1L, 3L, 200000L, 600000L, 400000L)))
    assert(m("cc") == (("cc", 1L, 0L, 200000L, 0L, -200000L)), "vanished word visible")
    assert(m("dd") == (("dd", 0L, 1L, 0L, 200000L, 200000L)), "appeared word visible")
    // ordering: |delta| desc, word asc -> aa before bb (tie), then cc/dd
    assert(out.map(_._1) == Seq("aa", "bb", "cc", "dd"))
  }

  test("boilerplate: cross-doc repeated sentences flagged, stripped in order") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      (0L, "Cookie banner. Unique zero. Footer text."),
      (1L, "Cookie banner. Unique one. Footer text."),
      (2L, "Cookie banner. Unique two here"),
      (3L, "Cookie banner. Footer text."), // ALL boilerplate -> empty
      (4L, "")).toDF("doc_id", "text")
    val sents = graft.ext.TextStats.sentences(docs)
    val boiler = graft.ext.TextStats.boilerplateSentences(sents)
      .as[(String, Long, Long)].collect().toSeq
    assert(boiler == Seq(("Cookie banner.", 4L, 4L), ("Footer text.", 3L, 3L)))
    val stripped = graft.ext.TextStats.stripBoilerplate(docs)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(stripped(0L) == ((0L, "Unique zero.", 1L, 2L)))
    assert(stripped(1L) == ((1L, "Unique one.", 1L, 2L)))
    assert(stripped(2L) == ((2L, "Unique two here", 1L, 1L)))
    assert(stripped(3L) == ((3L, "", 0L, 2L)))
    assert(stripped(4L) == ((4L, "", 0L, 0L)))
    // order preservation with >1 kept sentence around a dropped one
    val multi = Seq((9L, "Keep one. Cookie banner. Keep two. Cookie banner. Keep three"))
      .toDF("doc_id", "text")
    val both = docs.select("doc_id", "text").unionByName(multi)
    val r9 = graft.ext.TextStats.stripBoilerplate(both)
      .filter(col("doc_id") === 9L)
      .as[(Long, String, Long, Long)].head()
    assert(r9 == ((9L, "Keep one. Keep two. Keep three", 3L, 2L)))
  }
}
