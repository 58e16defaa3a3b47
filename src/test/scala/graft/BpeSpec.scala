package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer: hand-computed merges on the classic corpus, canonical
  * greedy (non-overlapping) merge application, determinism. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(text: String) =
    Seq((1L, text, "s")).toDF("doc_id", "text", "source")

  test("classic corpus learns (l,o) -> (lo,w) -> (low,_) first") {
    // low×5, lower×2, newest×2: pair (l,o)=7 ties (o,w)=7, lhs tiebreak
    val corpus = docs(("low " * 5) + ("lower " * 2) + ("newest " * 2))
    val (merges, _) = Bpe.train(corpus, 3)
    assert(merges.map(m => (m.rnd, m.lhs, m.rhs, m.merged, m.cnt)) == Seq(
      (1, "l", "o", "lo", 7L),
      (2, "lo", "w", "low", 7L),
      (3, "low", "_", "low_", 5L)))
  }

  test("greedy merge is non-overlapping left-to-right (aaaa -> aa aa)") {
    val (merges, words) = Bpe.train(docs("aaaa"), 1)
    assert(merges.head.lhs == "a" && merges.head.rhs == "a" && merges.head.cnt == 3L)
    val syms = words.select("l").as[Seq[String]].collect().head
    assert(syms == Seq("aa", "aa", "_"))
  }

  test("merged symbols re-pair across rounds (aaaa fully collapses)") {
    // round 2: (aa,aa) and (aa,_) tie at 1; '_' < 'a' so (aa,_) wins
    val (merges, words) = Bpe.train(docs("aaaa"), 3)
    assert(merges.map(_.merged) == Seq("aa", "aa_", "aaaa_"))
    val syms = words.select("l").as[Seq[String]].collect().head
    assert(syms == Seq("aaaa_"))
  }

  test("trainer is deterministic and drains when no pairs remain") {
    val corpus = docs("ab ab")
    // ab -> a b _: merges (a,b), (ab,_) then the single symbol has no pairs
    val (m1, w1) = Bpe.train(corpus, 10)
    val (m2, _) = Bpe.train(corpus, 10)
    assert(m1 == m2)
    assert(m1.map(_.merged) == Seq("ab", "ab_"))
    assert(w1.select("l").as[Seq[String]].collect().head == Seq("ab_"))
  }

  test("subword frequencies account for every token occurrence") {
    val corpus = docs(("low " * 5) + ("lower " * 2))
    val freqs = Bpe.subwordFrequencies(corpus, 2)
      .as[(String, Long)].collect().toMap
    // after (l,o) and (lo,w): low -> [low, _], lower -> [low, e, r, _]
    assert(freqs == Map("low" -> 7L, "_" -> 7L, "e" -> 2L, "r" -> 2L))
  }

  test("non-ascii words are excluded from the training alphabet") {
    val corpus = docs("über über low low")
    val words = Bpe.initialWords(corpus).select("word").as[String].collect().toSeq
    assert(words == Seq("low"))
  }
}
