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
