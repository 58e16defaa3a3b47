package graft

import graft.ext.TextStats

/** BM25: hand-replicated scores on a tiny corpus, hit accounting,
  * non-matching docs excluded, k-boundary tiebreak determinism. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  // the exact double expression the operator evaluates, replicated
  private def term(tf: Long, dl: Long, df: Long, nDocs: Long, avgdl: Double): Long = {
    val idf = math.log(1.0 + ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5))
    val denom = tf.toDouble + k1 * ((1.0 - b) + (b * dl.toDouble) / avgdl)
    math.round(idf * ((tf.toDouble * (k1 + 1.0)) / denom) * 1e6)
  }

  test("scores match the hand-replicated BM25 formula; non-matches drop out") {
    val docs = Seq(
      (0L, "x x y"),
      (1L, "x z"),
      (2L, "z z z")
    ).toDF("doc_id", "text")
    val got = TextStats.bm25(docs, Seq("x", "y"), 10)
      .as[(Long, Long, Long)].collect().toSeq
    val avgdl = 8.0 / 3.0
    val want0 = term(2, 3, 2, 3, avgdl) + term(1, 3, 1, 3, avgdl)
    val want1 = term(1, 2, 2, 3, avgdl)
    assert(got.map(_._1) == Seq(0L, 1L), "doc 2 matches no term and must be absent")
    assert(got == Seq((0L, 2L, want0), (1L, 1L, want1)))
    assert(want0 > want1, "two-term match with higher tf outranks")
  }

  test("rarer term contributes more at equal tf (idf monotonicity)") {
    val docs = Seq(
      (0L, "rare"),
      (1L, "common"),
      (2L, "common"),
      (3L, "common")
    ).toDF("doc_id", "text")
    val got = TextStats.bm25(docs, Seq("rare", "common"), 10)
      .as[(Long, Long, Long)].collect().toSeq
    val byDoc = got.map(r => r._1 -> r._3).toMap
    assert(byDoc(0L) > byDoc(1L))
  }

  test("k cuts at the score boundary with the id tiebreak; deterministic") {
    // four identical docs → identical scores; k=2 must keep the two
    // smallest ids, and repeat runs agree
    val docs = (0L until 4L).map(i => (i, "x y x")).toDF("doc_id", "text")
    val a = TextStats.bm25(docs, Seq("x"), 2).as[(Long, Long, Long)].collect().toSeq
    val bRun = TextStats.bm25(docs, Seq("x"), 2).as[(Long, Long, Long)].collect().toSeq
    assert(a == bRun)
    assert(a.map(_._1) == Seq(0L, 1L))
  }
}
