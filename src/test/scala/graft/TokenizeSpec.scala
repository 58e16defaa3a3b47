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
}
