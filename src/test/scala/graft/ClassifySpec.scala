package graft

import graft.ext.Classify

/** Naive Bayes classifier: hand-computed scores, separable corpus,
  * deterministic argmax tiebreak. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def lnS(x: Double): Long = math.round(math.log(x) * 1e6)

  test("disjoint-vocab corpus is classified perfectly") {
    val docs = Seq(
      (0L, "alpha beta alpha", "en"),
      (1L, "beta alpha beta beta", "en"),
      (2L, "uno dos uno", "es"),
      (3L, "dos dos uno dos", "es")
    ).toDF("doc_id", "text", "lang")
    val got = Classify.naiveBayesPredict(docs)
      .select("doc_id", "pred", "is_correct")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq("en", "en", "es", "es"))
    assert(got.forall(_._3))
  }

  test("confusion matrix cells partition the corpus; diagonal = correct count") {
    val docs = Seq(
      (0L, "alpha beta alpha", "en"),
      (1L, "beta alpha beta beta", "en"),
      (2L, "uno dos uno", "es"),
      (3L, "dos dos uno dos", "es"),
      (4L, "alpha uno", "es") // mixed-vocab doc: may land either way
    ).toDF("doc_id", "text", "lang")
    val m = Classify.naiveBayesConfusion(docs)
      .as[(String, String, Long)].collect().toSeq
    assert(m.map(_._3).sum == 5L, "cells must partition the corpus")
    val preds = Classify.naiveBayesPredict(docs)
      .select("is_correct").as[Boolean].collect()
    assert(m.filter(r => r._1 == r._2).map(_._3).sum == preds.count(identity))
  }

  test("score matches the hand-computed smoothed log-likelihood") {
    // Corpus: en = {a:2, b:1} (1 doc), fr = {c:1} (1 doc). V = 3.
    val docs = Seq(
      (0L, "a a b", "en"),
      (1L, "c", "fr")
    ).toDF("doc_id", "text", "lang")
    val scores = Classify.naiveBayesScores(docs)
      .as[(Long, String, Long)].collect()
      .map { case (id, c, s) => (id, c) -> s }.toMap
    // doc 0 (tokens a,a,b) vs en: prior ln(1/2), hits 2·ln(2+1) + 1·ln(1+1),
    // normalizer 3·ln(3+3)
    val want0en = lnS(0.5) + 2 * lnS(3) + lnS(2) - 3 * lnS(6)
    // doc 0 vs fr: no hits (a,b unseen in fr), normalizer 3·ln(1+3)
    val want0fr = lnS(0.5) + 0 - 3 * lnS(4)
    assert(scores((0L, "en")) == want0en)
    assert(scores((0L, "fr")) == want0fr)
    // doc 1 (token c) vs fr: 1·ln(1+1) − 1·ln(4); vs en: −ln(6)
    assert(scores((1L, "fr")) == lnS(0.5) + lnS(2) - lnS(4))
    assert(scores((1L, "en")) == lnS(0.5) - lnS(6))
  }

  test("exact score ties break to the lexicographically smaller class") {
    // Perfectly symmetric corpus: both classes have identical counts, so
    // every document's two scores are equal BIGINTs.
    val docs = Seq(
      (0L, "same same", "aa"),
      (1L, "same same", "bb")
    ).toDF("doc_id", "text", "lang")
    val got = Classify.naiveBayesPredict(docs)
      .select("doc_id", "pred", "is_correct")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq("aa", "aa"))
    assert(got.map(_._3) == Seq(true, false))
  }

  test("zero-token documents still score: prediction is the max-prior class") {
    val docs = Seq(
      (0L, "alpha beta", "en"),
      (1L, "uno", "es"),
      (2L, "gamma", "en"),
      (3L, "   ", "es") // whitespace-only: zero tokens
    ).toDF("doc_id", "text", "lang")
    val got = Classify.naiveBayesPredict(docs)
      .select("doc_id", "pred")
      .as[(Long, String)].collect().toMap
    assert(got.size == 4, "every document gets a prediction")
    // en has 2 docs vs es 2... priors tie at 2/4 each; the doc-3 score is
    // prior − 0·norm for both classes → tiebreak to "en"
    assert(got(3L) == "en")
  }

  test("prediction is deterministic across runs") {
    val docs = Seq(
      (0L, "x y z x", "en"),
      (1L, "y y z", "en"),
      (2L, "z z z y", "zh"),
      (3L, "x z", "zh")
    ).toDF("doc_id", "text", "lang")
    val a = Classify.naiveBayesPredict(docs).collect().toSeq
    val b = Classify.naiveBayesPredict(docs).collect().toSeq
    assert(a == b)
  }

  test("centroid confusion: separated clusters are diagonal, planted outlier crosses") {
    // two tight clusters on opposite axes; vector 5 carries label 0 but
    // sits in cluster 1's region -> exactly one off-diagonal cell
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0), (2L, Array(1.1f, -0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.1f, 0.9f), 1),
      (5L, Array(0.0f, 1.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Classify.centroidConfusion(emb)
      .as[(Long, Long, Long)].collect().toSet
    // label-0 centroid is dragged by the outlier but stays x-dominant;
    // vectors 0-2 classify 0, vectors 3-5 classify 1
    assert(got == Set((0L, 0L, 3L), (0L, 1L, 1L), (1L, 1L, 2L)))
    // counts conserve the corpus and the matrix is repartition-invariant
    assert(got.toSeq.map(_._3).sum == 6L)
    val again = Classify.centroidConfusion(emb.repartition(7))
      .as[(Long, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("centroid confusion: empty input yields empty matrix; bound guard fires loudly") {
    val empty = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(Classify.centroidConfusion(empty).count() == 0)
    // out-of-domain magnitude (|x| > 8) must throw the documented
    // requirement, not silently mis-assign
    val wild = Seq((0L, Array(-9.5f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Classify.centroidConfusion(wild).collect()
    }
    assert(e.getMessage.contains("shift domain"))
  }

  test("centroid confusion: high-cardinality label column fails fast, not OOM") {
    // a caller passing an id-like column as the label must get a readable
    // requirement failure BEFORE the labels*dim driver collect
    val emb = (0L until 50L).map(i => (i, Array(0.1f, 0.2f), i.toInt))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Classify.centroidConfusion(emb, maxLabels = 10)
    }
    assert(e.getMessage.contains("50 distinct labels"))
    assert(e.getMessage.contains("maxLabels=10"))
    // at or under the cap the same corpus trains fine
    assert(Classify.centroidConfusion(emb, maxLabels = 50).count() > 0)
  }
}
