package graft

import org.apache.spark.sql.functions._

import graft.ext.WordPiece

/** WordPiece: greedy longest-match-first semantics (including the
  * defining divergence from Viterbi — a long first piece stranding the
  * tail), the all-or-nothing [UNK] degradation, wire forms, and the
  * vocabulary's initial-vs-continuation split. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("greedy longest-match-first, wire forms correct") {
    val v = Set("un", "u", "##n", "##aff", "##able", "##a", "##f", "##b", "##l", "##e")
    assert(WordPiece.greedy("unaffable", v) ==
      Some(List("un", "##aff", "##able")))
    // longest wins at every step: "##aff" beat "##a", "##able" beat "##a"
    val v2 = Set("a", "##b", "##bc")
    assert(WordPiece.greedy("abc", v2) == Some(List("a", "##bc")))
  }

  test("greedy strands the tail where Viterbi would not — the defining divergence") {
    // greedy takes "ab" (longest initial), leaving "c" with no "##c";
    // the segmentation "a ##bc" EXISTS but greedy never finds it
    val v = Set("ab", "a", "##bc")
    assert(WordPiece.greedy("abc", v).isEmpty)
    // the unigram-style optimal decode over equivalent pieces succeeds
    val logp = Map("a" -> -10L, "ab" -> -5L, "bc" -> -10L, "b" -> -20L, "c" -> -20L)
    assert(graft.ext.Unigram.viterbi("abc", logp)._1 == List("a", "bc"))
  }

  test("[UNK] is all-or-nothing: a missing continuation kills the whole word") {
    val v = Set("x", "##y")
    assert(WordPiece.greedy("xy", v) == Some(List("x", "##y")))
    assert(WordPiece.greedy("xyz", v).isEmpty) // no ##z
    assert(WordPiece.greedy("zx", Set("x")).isEmpty) // no initial z... no "z"
  }

  test("vocabulary: prefixes as initials, ## continuations, forced single-char initials") {
    val docs = Seq((1L, "abca abca dd"), (2L, "abca q"))
      .toDF("doc_id", "text")
    val v = WordPiece.vocabulary(docs)
      .select("piece", "cnt", "is_continuation")
      .as[(String, Long, Boolean)].collect().toSeq
    val (cont, init) = v.partition(_._3)
    assert(cont.forall(_._1.startsWith("##")))
    assert(init.forall(p => !p._1.startsWith("##")))
    // prefixes of "abca" (wc 3): a, ab, abc, abca — all initial
    assert(init.map(_._1).toSet.contains("abca"))
    assert(init.find(_._1 == "a").exists(_._2 == 3L)) // prefix count, not occurrences
    // "##bca" is a continuation substring of abca
    assert(cont.find(_._1 == "##bca").exists(_._2 == 3L))
    // forced single-char initials: q (wc 1) present even if rare
    assert(init.exists(_._1 == "q"))
  }

  test("encode over the corpus: non-UNK segmentations reassemble to their words") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = WordPiece.encode(docs)
      .select("word", "segmentation", "n_pieces", "is_unk")
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    rows.filter(!_._4).foreach { case (w, seg, np, _) =>
      val pieces = seg.split(" ").toSeq
      assert(pieces.length.toLong == np, s"$w piece count")
      assert(!pieces.head.startsWith("##") && pieces.tail.forall(_.startsWith("##")),
        s"$w wire forms: $seg")
      assert(pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString == w,
        s"$w does not reassemble from '$seg'")
    }
    rows.filter(_._4).foreach { case (w, seg, np, _) =>
      assert(seg == WordPiece.Unk && np == 1L, s"$w unk row malformed")
    }
  }
}
