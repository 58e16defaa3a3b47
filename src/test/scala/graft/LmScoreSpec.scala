package graft

import graft.ext.LmScore

/** Bigram-LM scoring: hand-computed smoothed log-likelihoods. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-one-smoothed bigram scores") {
    val docs = Seq(
      (1L, "a b a b", "s"),
      (2L, "a b", "s"),
      (3L, "a", "s") // no bigram: absent from output
    ).toDF("doc_id", "text", "source")
    // uni: a=4, b=3, V=2; bi: "a b"=3, "b a"=1
    // lp(a b) = round(ln(4/6)*1e6)  = -405465
    // lp(b a) = round(ln(2/5)*1e6)  = -916291
    val lpAb = math.round(math.log(4.0 / 6.0) * 1e6)
    val lpBa = math.round(math.log(2.0 / 5.0) * 1e6)
    val got = LmScore.scoreDocuments(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2 * lpAb + lpBa),
      (2L, 1L, lpAb)))
  }

  test("hand-computed interpolated Kneser-Ney scores (D = 3/4)") {
    val docs = Seq(
      (1L, "a b a b", "s"),
      (2L, "a b", "s"),
      (3L, "a", "s") // no bigram: absent from output
    ).toDF("doc_id", "text", "source")
    // bi types: "a b" c=3, "b a" c=1 -> NT=2
    // ctx a: ca=3, n1a=1 ; ctx b: ca=1, n1a=1
    // cont b: n1w=1 ; cont a: n1w=1
    // P(b|a) = ((4*3-3)*2 + 3*1*1) / (4*3*2) = 21/24
    // P(a|b) = ((4*1-3)*2 + 3*1*1) / (4*1*2) = 5/8
    val lpAb = math.round(math.log(21.0 / 24.0) * 1e6)
    val lpBa = math.round(math.log(5.0 / 8.0) * 1e6)
    val got = LmScore.kneserNeyScoreDocuments(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2 * lpAb + lpBa),
      (2L, 1L, lpAb)))
  }

  test("KN rewards a rare continuation of a promiscuous context vs add-one") {
    // context "the" continues into many distinct words; "mat" appears
    // only after "the". KN's continuation term keeps P(mat|the) from
    // collapsing to the add-one floor.
    val docs = Seq(
      (1L, "the cat and the dog and the bird and the fish ate", "s"),
      (2L, "the mat", "s")
    ).toDF("doc_id", "text", "source")
    val kn = LmScore.kneserNeyScoreDocuments(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // every "the X" bigram is seen once with identical stats; doc 2's
    // single bigram must score identically to any other once-seen
    // "the X" continuation (KN is exchangeable over them)
    assert(kn(2L) < 0L)
    // sanity vs direct formula: c=1, ca=11... compute from the corpus
    // stats rather than pinning magic numbers
    val biTypes = Seq("the cat", "cat and", "and the", "the dog", "dog and",
      "the bird", "bird and", "the fish", "fish ate", "the mat")
    val nt = biTypes.size.toLong
    val caThe = 5L // "the" occurs 5 times as a context (cat,dog,bird,fish,mat)
    val n1aThe = 5L
    val n1wMat = 1L
    val want = math.round(math.log(
      ((4L * 1L - 3L) * nt + 3L * n1aThe * n1wMat).toDouble / (4L * caThe * nt).toDouble) * 1e6)
    assert(kn(2L) == want)
  }

  test("repetitive noise scores below normal prose per bigram") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog sat on the rug", "s"),
      (2L, "zz qq zz rr zz ss zz tt zz uu zz vv zz ww", "s")
    ).toDF("doc_id", "text", "source")
    val rows = LmScore.scoreDocuments(docs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._3.toDouble / r._2)).toMap
    assert(rows(1L) > rows(2L), s"prose ${rows(1L)} should beat noise ${rows(2L)}")
  }
}
