package graft

import graft.ext.AhoCorasick

/** Aho–Corasick: overlapping-match semantics (failure + output links)
  * against hand cases and a brute-force oracle. */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pats: Seq[String], text: String): Seq[(String, Int)] =
    for {
      p <- pats
      i <- 1 to text.length - p.length + 1
      if text.substring(i - 1, i - 1 + p.length) == p
    } yield (p, i)

  test("hand case: matches inside matches, all start positions, text order") {
    val m = new AhoCorasick.Matcher(Array("the", "he", "hear", "ear", "a"))
    // "theart" = t[hear]t: the(1), he(2), hear(2), ear(3), a(4) — four
    // patterns ending inside one another, all found in one pass
    val got = m.occurrences("theart").map { case (pi, pos) => (m.patterns(pi), pos) }.toSeq
    assert(got.toSet == Set(("the", 1), ("he", 2), ("hear", 2), ("ear", 3), ("a", 4)))
    // "hearhear": hear(1,5), he(1,5), ear(2,6), a(3,7)
    val got2 = m.occurrences("hearhear").map { case (pi, pos) => (m.patterns(pi), pos) }.toSeq
    assert(got2.toSet == Set(("hear", 1), ("hear", 5), ("he", 1), ("he", 5),
      ("ear", 2), ("ear", 6), ("a", 3), ("a", 7)))
  }

  test("automaton == brute force on pseudo-random text, every pattern set") {
    val pats = AhoCorasick.FixturePatterns
    var seed = 12345L
    val alphabet = "thearandion x"
    for (n <- Seq(0, 1, 7, 50, 400)) {
      val text = new String(Array.fill(n) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        alphabet(((seed >>> 33) % alphabet.length).toInt)
      })
      val m = new AhoCorasick.Matcher(pats.toArray)
      val got = m.occurrences(text).map { case (pi, pos) => (pats(pi), pos) }.toSeq.sorted
      assert(got == brute(pats, text).sorted, s"n=$n text=$text")
    }
  }

  test("match report over a planted frame: counts, first positions, null text") {
    val docs = Seq(
      (1L, "the data and the ear"),
      (2L, "xyz"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = AhoCorasick.matchReport(docs, Seq("the", "ear", "data", "q"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows.contains((1L, "the", 2L, 1L)))
    assert(rows.contains((1L, "ear", 1L, 18L)))
    assert(rows.contains((1L, "data", 1L, 5L)))
    assert(!rows.exists(_._1 == 2L) && !rows.exists(_._1 == 3L))
  }
}
