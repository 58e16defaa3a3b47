package graft

import org.apache.spark.sql.functions._
import graft.ext.{Bpe, ByteBpe}

/** Byte-level BPE: the UTF-8-byte alphabet, the multi-byte split, the
  * earned cross-byte merge, and lossless hex decode. */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  test("initial symbols are the word's UTF-8 bytes; multi-byte chars split") {
    val rows = Seq((1L, "protégé x", "s"))
      .toDF("doc_id", "text", "source")
    val l = ByteBpe.initialWords(rows)
      .filter(col("word") === "protégé")
      .select("l").as[Seq[String]].head()
    // p r o t é(c3 a9) g é(c3 a9) + end mark = 10 symbols
    assert(l == Seq("70", "72", "6f", "74", "c3", "a9", "67", "c3", "a9", "_"))
    // hex decode of the symbols (minus the mark) is the exact word bytes
    val back = l.dropRight(1).map(Integer.parseInt(_, 16).toByte).toArray
    assert(new String(back, java.nio.charset.StandardCharsets.UTF_8) == "protégé")
  }

  test("a dominant multi-byte char EARNS its merge: c3+a9 becomes one symbol") {
    // a corpus where é-pairs dominate: the top merge must be (c3, a9)
    val docs = Seq.tabulate(30)(i => (i.toLong, "éé éa éb", "s"))
      .toDF("doc_id", "text", "source")
    val top = ByteBpe.mergeTable(docs, merges = 1, batch = 1)
      .select("lhs", "rhs", "merged").as[(String, String, String)].head()
    assert(top == (("c3", "a9", "c3a9")))
  }

  test("every string tokenizes: no out-of-alphabet token in the byte universe") {
    // the char-BPE trainer DROPS accented words ([a-z0-9]+ only); the
    // byte family admits them — the family's reason to exist
    val docs = Seq((1L, "naïve café naïve", "s")).toDF("doc_id", "text", "source")
    val charWords = Bpe.initialWords(docs).count()
    val byteWords = ByteBpe.initialWords(ByteBpe.saltedDocs(docs))
      .filter(col("word").isin("naïve", "café", "cafés", "protégé")).count()
    assert(charWords == 0L)
    assert(byteWords >= 3L)
  }

  test("encode output is consistent: n_subwords == segment count, end-marked") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 40)
    val enc = ByteBpe.encodeCorpus(docs, merges = 8)
      .as[(Long, Long, Long, String)].collect()
    assert(enc.nonEmpty)
    for ((_, nTok, nSub, seg) <- enc if nTok > 0) {
      val syms = seg.split(" ")
      assert(syms.length.toLong == nSub)
      // exactly one end-marked symbol per word (the mark may have been
      // merged into a larger symbol, but never duplicated or lost)
      assert(syms.count(_.endsWith(Bpe.EndMark)) == nTok.toInt)
      // all symbols stay inside the hex+mark universe
      assert(syms.forall(_.matches("[a-f0-9_]+")), syms.take(5).mkString(","))
    }
  }

  test("pretokenizer: contractions split, leading spaces attach, categories break") {
    def pretoks(s: String): Seq[String] =
      Seq((1L, s)).toDF("doc_id", "text")
        .select(ByteBpe.pretokenize(col("text")).as("p"))
        .collect().head.getSeq[String](0)
    assert(pretoks("don't stop") === Seq("don", "'t", " stop"))
    assert(pretoks("we'll we've I'm you're he's it'd") ===
      Seq("we", "'ll", " we", "'ve", " I", "'m", " you", "'re",
        " he", "'s", " it", "'d"))
    // category breaks: letters|numbers|punct are separate runs
    assert(pretoks("abc123 done") === Seq("abc", "123", " done"))
    assert(pretoks("x, y!") === Seq("x", ",", " y", "!"))
    // ONE leading space attaches to the following run (GPT convention);
    // a MULTI-space run stays one whitespace token — the documented
    // lookahead-free divergence from upstream GPT-2
    assert(pretoks("hi !") === Seq("hi", " !"))
    assert(pretoks("a   b") === Seq("a", "   ", "b"))
    // losslessness: concatenating pretokens reproduces the text exactly
    val texts = Seq("don't  stop, won't\tgo 42x", " leading", "trailing  ",
      "protégé café 中文 mixed")
    for (t <- texts) assert(pretoks(t).mkString("") === t)
  }

  test("pretok query shape: ordinal positions, spaces preserved") {
    val docs = Seq((7L, "don't go"), (8L, "")).toDF("doc_id", "text")
    val got = ByteBpe.pretokCorpus(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === Seq((7L, 0L, "don"), (7L, 1L, "'t"), (7L, 2L, " go")))
  }
}
