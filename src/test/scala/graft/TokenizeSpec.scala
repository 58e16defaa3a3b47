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
}
