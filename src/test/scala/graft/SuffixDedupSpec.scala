package graft

import org.apache.spark.sql.DataFrame

import graft.ext.Dedup

/** Suffix-array exact-substring dedup: prefix-doubling rank contracts
  * (equality ⇔ window equality, order = lexicographic), brute-force
  * span equality, and the motivating counter-example — a duplicate
  * straddling two of spanDedup's quantized windows that only the
  * suffix-array form catches. */
class SuffixDedupSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def tokensOf(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(_.nonEmpty)
      .map(_.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", ""))

  /** Naive ground truth: merged runs of duplicated l-gram starts. */
  private def bruteSpans(rows: Seq[(Long, String)], l: Int): Seq[(Long, Long, Long)] = {
    val grams = for {
      (id, text) <- rows
      toks = tokensOf(text)
      p <- 0 to toks.length - l
    } yield (id, p.toLong, toks.slice(p, p + l).mkString(" "))
    val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val covered = grams.filter(g => dup(g._3)).map(g => (g._1, g._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    covered.toSeq.flatMap { case (id, starts) =>
      val runs = starts.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
        if (acc.nonEmpty && acc.last.last == p - 1) acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      runs.map(r => (id, r.head, r.last - r.head + l))
    }.sortBy(t => (t._1, t._2))
  }

  test("spans equal the naive all-window ground truth") {
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "a quick brown fox jumps over the lazy cat instead",
      3L -> "repeat me now repeat me now repeat me now done",
      4L -> "completely unrelated text with no shared phrases at all",
      5L -> "the quick brown fox jumps over the lazy dog tomorrow")
    val got = Dedup.suffixDuplicateSpans(docsOf(rows: _*), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === bruteSpans(rows, 4))
    assert(got.nonEmpty)
  }

  test("a duplicate straddling two quantized windows: spanDedup misses, suffix catches") {
    val rows = Seq(
      10L -> "alpha beta shareda shareb sharec shared omega psi",
      11L -> "shareda shareb sharec shared xray yankee")
    val docs = docsOf(rows: _*)
    // spanDedup(3): doc 10 cuts [alpha beta shareda][shareb sharec shared]
    // [omega psi]; doc 11 cuts [shareda shareb sharec][shared xray yankee].
    // No 3-token span text repeats, so NOTHING is deduplicated:
    val quantized = Dedup.spanDedup(docs, 3).collect()
    assert(quantized.forall(r => r.getAs[Long]("n_kept") == r.getAs[Long]("n_spans")),
      "the quantized form should (provably) miss the straddling duplicate")
    // the suffix-array form reports the shared 4-gram in BOTH documents
    val spans = Dedup.suffixDuplicateSpans(docs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((10L, 2L, 4L), (11L, 0L, 4L)))
  }

  test("within-document repetition is duplicate-covered too") {
    val rows = Seq(20L -> "intro p q r s middle p q r s outro")
    val spans = Dedup.suffixDuplicateSpans(docsOf(rows: _*), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((20L, 1L, 4L), (20L, 6L, 4L)))
  }


  test("non-power-of-two windows: equal L-grams with diverging padded tails still match") {
    // the two 5-gram copies sit at different distances from their doc
    // ends, so the NEXT-POWER-OF-2 (8-token) padded windows differ — a
    // doubling that overshoots L would rank them apart and miss the dup
    val rows = Seq(
      30L -> "p1 c1 c2 c3 c4 c5",                  // 5-gram at pos 1, 0 tokens after
      31L -> "c1 c2 c3 c4 c5 t1 t2 t3 t4 t5 t6")   // same 5-gram at pos 0, 6 after
    for (l <- Seq(3, 5, 6, 7)) {
      val got = Dedup.suffixDuplicateSpans(docsOf(rows: _*), l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === bruteSpans(rows, l), s"window L=$l")
    }
    val spans5 = Dedup.suffixDuplicateSpans(docsOf(rows: _*), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans5 === Set((30L, 1L, 5L), (31L, 0L, 5L)))
  }

  test("non-power-of-two rank order stays lexicographic on the true L-window") {
    val rows = Seq(
      40L -> "b x y z q extra tail tokens here",
      41L -> "a x y z q")
    val ranks = Dedup.suffixWindowRanks(docsOf(rows: _*), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byKey = ranks.map { case (id, pos, rk) => (id, pos) -> rk }.toMap
    // shared 4-gram "x y z q": doc 40 continues with "extra", doc 41 ends
    // (sentinel) — the shorter window must rank strictly BELOW the longer
    assert(byKey((41L, 1L)) < byKey((40L, 1L)))
    // and "a ..." < "b ..." on the first token
    assert(byKey((41L, 0L)) < byKey((40L, 0L)))
  }


  /** Naive exact ground truth for the LCP report: per position, the max
    * common token prefix with ANY other corpus position; per doc, the
    * max with smallest start. */
  private def bruteLcpReport(rows: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val sufs = for {
      (id, text) <- rows
      toks = tokensOf(text)
      p <- toks.indices
    } yield (id, p.toLong, toks.drop(p))
    def cp(a: Seq[String], b: Seq[String]): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    val per = sufs.map { case (id, p, s) =>
      val best = sufs.iterator.filter(o => (o._1, o._2) != (id, p))
        .map(o => cp(s, o._3)).maxOption.getOrElse(0L)
      (id, p, best)
    }
    per.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
      val m = ps.map(_._3).max
      if (m >= 1) Some((id, ps.filter(_._3 == m).map(_._2).min, m)) else None
    }.sortBy(_._1)
  }

  test("exact LCP report equals the naive all-pairs ground truth") {
    val rows = Seq(
      60L -> "the quick brown fox jumps over the lazy dog today",
      61L -> "a quick brown fox jumps over the lazy cat instead",
      62L -> "repeat me now repeat me now done",
      63L -> "only unique words appear here nowhere else ever",
      64L -> "fox jumps over the lazy dog today was the end")
    val got = Dedup.suffixLcpReport(docsOf(rows: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === bruteLcpReport(rows))
    assert(got.nonEmpty)
  }

  test("one token below the window: quantized L=8 sees nothing, the LCP report says 7") {
    val rows = Seq(
      70L -> "u1 u2 s1 s2 s3 s4 s5 s6 s7 u3 u4",
      71L -> "v1 s1 s2 s3 s4 s5 s6 s7 v2 v3 v4")
    val docs = docsOf(rows: _*)
    // no duplicated 8-gram exists — the quantized form is provably blind
    assert(Dedup.suffixDuplicateSpans(docs, 8).collect().isEmpty)
    val got = Dedup.suffixLcpReport(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((70L, 2L, 7L), (71L, 1L, 7L)))
  }

  test("LCP report tie-break: smallest start among equal-length maxima") {
    val rows = Seq(
      80L -> "x1 a b x2 a b x3",
      81L -> "fully distinct filler tokens qq ww ee rr")
    // doc 80: "a b" duplicated at starts 1 and 4 (len 2) — report start 1
    val got = Dedup.suffixLcpReport(docsOf(rows: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((80L, 1L, 2L)))
  }

  test("cross-corpus contamination: train leaks flagged, eval-only repeats not counted") {
    val train = docsOf(
      1L -> "the secret benchmark answer is forty two exactly here",
      2L -> "unrelated training prose about other things entirely now")
    val eval = docsOf(
      // leaked: carries a 8-token run straight from train doc 1
      100L -> "prompt says the secret benchmark answer is forty two exactly here thanks",
      // clean: novel text, but with an INTERNAL repeat (eval-only
      // repetition must NOT count as contamination)
      101L -> "alpha beta gamma delta epsilon zeta eta theta alpha beta gamma delta epsilon zeta eta theta")
    val spans = Dedup.suffixCrossContamination(train, eval, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 100: windows at eval positions 2..3 ("the secret ... here")
    // both occur in train doc 1 -> one merged span of length 9
    assert(spans === Seq((100L, 2L, 9L)))
  }

  test("prefix-doubling ranks: equality iff window equality, order lexicographic") {
    val l = 4
    val rows = Seq(
      30L -> "b a c a b a c d",
      31L -> "a b a c a",
      32L -> "c d b a")
    val ranked = Dedup.suffixWindowRanks(docsOf(rows: _*), l)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("rank"))).toMap
    // windows padded with "" (the rank-0 sentinel sorts below every token)
    val windows = (for {
      (id, text) <- rows
      toks = tokensOf(text)
      p <- toks.indices
    } yield ((id, p.toLong), toks.slice(p, p + l).padTo(l, ""))).toMap
    assert(ranked.keySet === windows.keySet)
    for (k1 <- windows.keys; k2 <- windows.keys) {
      val (w1, w2) = (windows(k1), windows(k2))
      val (r1, r2) = (ranked(k1), ranked(k2))
      assert((r1 == r2) == (w1 == w2), s"$k1=$w1 rank $r1 vs $k2=$w2 rank $r2")
      val lex = Ordering.Implicits.seqOrdering[Seq, String].compare(w1, w2)
      assert(math.signum(lex.toLong) == math.signum(r1 - r2) || lex == 0,
        s"order violated: $w1($r1) vs $w2($r2)")
    }
    // ranks are dense from 1
    val distinct = ranked.values.toSet
    assert(distinct === (1L to distinct.size.toLong).toSet)
  }
}
