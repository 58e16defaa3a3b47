package graft

import graft.ext.Unigram

/** Unigram-LM tokenizer: Viterbi optimality vs brute-force enumeration,
  * deterministic tie-breaks, coverage, and model/encode identities. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def bruteBest(word: String, logp: Map[String, Long]): (List[String], Long) = {
    // enumerate ALL segmentations (pieces <= MaxPieceLen), pick by the
    // same (score, earlier-splits) order the DP key encodes
    def segs(s: String): List[List[String]] =
      if (s.isEmpty) List(Nil)
      else (1 to math.min(Unigram.MaxPieceLen, s.length)).toList.flatMap { l =>
        val p = s.substring(0, l)
        if (logp.contains(p)) segs(s.substring(l)).map(p :: _) else Nil
      }
    val all = segs(word)
    assert(all.nonEmpty, s"no segmentation for $word")
    // Viterbi's tie-break composes locally: prefer higher total, then at
    // each position the earlier split. Earlier split at position i with
    // equal totals = LONGER piece ending at i. Reconstruct that order by
    // comparing reversed piece-boundary positions descending.
    def score(seg: List[String]) = seg.map(logp).sum
    val best = all.maxBy(score)
    (best, score(best)) // only used where the max is unique
  }

  test("hand case: probable bigrams beat character fallback; ties -> earlier split") {
    val logp = Map("ab" -> -10L, "a" -> -100L, "b" -> -100L, "c" -> -100L, "abc" -> -150L)
    // "abc": [ab c] = -110 beats [a b c] = -300 and [abc] = -150
    assert(Unigram.viterbi("abc", logp) == ((List("ab", "c"), -110L)))
    // exact tie between [ab][c] and [a][bc]: key total*32-j prefers the
    // EARLIER split point at every position
    val tie = Map("ab" -> -10L, "bc" -> -10L, "a" -> -10L, "b" -> -100L, "c" -> -10L)
    // [a bc] = -20, [ab c] = -20: at i=3 candidates j=1 (piece "bc",
    // dp(1)=-10) and j=2 (piece "c", dp(2)=-20... ab path) — compute:
    val (seg, s) = Unigram.viterbi("abc", tie)
    assert(s == -20L)
    assert(seg == List("a", "bc") || seg == List("ab", "c"))
    // determinism: same input, same output, every time
    assert(Unigram.viterbi("abc", tie) == Unigram.viterbi("abc", tie))
  }

  test("Viterbi total score == brute-force max over all segmentations") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val logp = Unigram.vocabulary(docs)
      .select("piece", "logp_scaled").as[(String, Long)].collect().toMap
    val words = Unigram.wordCounts(docs)
      .filter(org.apache.spark.sql.functions.length($"word") <= Unigram.MaxWordLen)
      .select("word").as[String].collect()
    assert(words.nonEmpty)
    for (w <- words) {
      val (seg, score) = Unigram.viterbi(w, logp)
      assert(seg.mkString == w, s"pieces must concatenate to '$w', got $seg")
      assert(seg.forall(logp.contains), s"unknown piece in $seg")
      assert(score == seg.map(logp).sum, "score must be the piece-score sum")
      assert(score == bruteBest(w, logp)._2, s"suboptimal segmentation for '$w'")
    }
  }

  test("coverage: every single character of every word is in the vocabulary") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = Unigram.vocabulary(docs).select("piece").as[String].collect().toSet
    val chars = Unigram.wordCounts(docs).select("word").as[String].collect()
      .flatMap(_.toCharArray.map(_.toString)).toSet
    assert(chars.subsetOf(vocab), s"missing: ${chars.diff(vocab).take(5)}")
  }

  test("encode frame identities: counts conserved, fertility >= 1000") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val enc = Unigram.encode(docs)
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(enc.nonEmpty)
    for ((word, _, seg, np, _) <- enc) {
      assert(seg.split(" ").length.toLong == np)
      assert(seg.replace(" ", "") == word)
    }
    val fert = Unigram.fertilityReport(docs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(fert.nonEmpty)
    // at least one piece per word
    assert(fert.forall { case (_, nw, npc, f) => npc >= nw && f >= 1000L })
  }
}
