package graft

import graft.ext.Eval
import org.apache.spark.sql.functions._

/** ROC/AUC evaluation: hand-computed sweep, Mann–Whitney cross-check,
  * tie handling, degenerate inputs. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def scoredDf(rows: (Long, Long, Boolean)*) =
    rows.toDF("doc_id", "score_scaled", "is_pos")

  test("ROC table matches the hand-computed sweep (with a tied score)") {
    // scores desc: 9(pos), 7(pos+neg tie), 5(neg), 3(pos), 1(neg)
    val scored = scoredDf(
      (0L, 9L, true), (1L, 7L, true), (2L, 7L, false),
      (3L, 5L, false), (4L, 3L, true), (5L, 1L, false))
    val got = Eval.rocTable(scored)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (9L, 1L, 0L, 1L, 0L),
      (7L, 1L, 1L, 2L, 1L),
      (5L, 0L, 1L, 2L, 2L),
      (3L, 1L, 0L, 3L, 2L),
      (1L, 0L, 1L, 3L, 3L)))
  }

  test("AUC matches the brute-force pair count, ties at half weight") {
    val rows = Seq(
      (0L, 9L, true), (1L, 7L, true), (2L, 7L, false),
      (3L, 5L, false), (4L, 3L, true), (5L, 1L, false))
    val (pos, neg) = rows.partition(_._3)
    val num2Brute = (for { p <- pos; n <- neg } yield {
      if (p._2 > n._2) 2L else if (p._2 == n._2) 1L else 0L
    }).sum
    val den2 = 2L * pos.size * neg.size
    val got = Eval.aucReport(scoredDf(rows: _*))
      .select(col("n_pos"), col("n_neg"), col("auc_num2").cast("long"),
        col("auc_den2").cast("long"), col("auc"))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((pos.size.toLong, neg.size.toLong, num2Brute, den2,
      num2Brute.toDouble / den2.toDouble)))
  }

  test("perfect and inverted rankings hit AUC 1 and 0; random ties hit 0.5") {
    val perfect = scoredDf((0L, 10L, true), (1L, 9L, true), (2L, 2L, false))
    assert(Eval.aucReport(perfect).select("auc").as[Double].head() == 1.0)
    val inverted = scoredDf((0L, 1L, true), (1L, 9L, false), (2L, 8L, false))
    assert(Eval.aucReport(inverted).select("auc").as[Double].head() == 0.0)
    val allTied = scoredDf((0L, 5L, true), (1L, 5L, false), (2L, 5L, true), (3L, 5L, false))
    assert(Eval.aucReport(allTied).select("auc").as[Double].head() == 0.5)
  }

  test("lift table: equal slices, conserved counts, perfect scorer front-loads") {
    // 10 docs, scores = 10-i (no ties): positives at the top 3 ranks
    val rows = (0L until 10L).map(i => (i, 10L - i, i < 3))
    val lift = Eval.liftTable(scoredDf(rows: _*), buckets = 5)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(lift.map(_._1) == (0L until 5L))
    assert(lift.forall(_._2 == 2L), "10 docs over 5 buckets = 2 each")
    assert(lift.map(_._3) == Seq(2L, 1L, 0L, 0L, 0L),
      "a perfect scorer concentrates positives in the top buckets")
    assert(lift.map(_._3).sum == 3L)
    lift.foreach(r => assert(r._4 == r._3.toDouble / r._2.toDouble))
    // non-divisible corpus: bucket sizes differ by at most one
    val lift3 = Eval.liftTable(scoredDf(rows: _*), buckets = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(lift3.map(_._2).sum == 10L)
    assert(lift3.map(_._2).max - lift3.map(_._2).min <= 1L)
  }

  test("null label counts as negative (CASE fall-through parity)") {
    val scored = Seq((0L, 9L, Some(true)), (1L, 5L, None))
      .toDF("doc_id", "score_scaled", "is_pos")
    val got = Eval.rocTable(scored)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((9L, 1L, 0L, 1L, 0L), (5L, 0L, 1L, 1L, 1L)))
  }

  test("NB one-vs-rest scoring frame carries every document exactly once") {
    val docs = Seq(
      (0L, "alpha beta alpha", "en"),
      (1L, "beta alpha beta beta", "en"),
      (2L, "uno dos uno", "es"),
      (3L, "dos dos uno dos", "es")
    ).toDF("doc_id", "text", "lang")
    val scored = Eval.binaryNbScores(docs, "en")
    assert(scored.count() == 4L)
    assert(scored.select("doc_id").distinct().count() == 4L)
    // separable corpus: the en detector ranks both en docs above both es
    val auc = Eval.aucReport(scored).select("auc").as[Double].head()
    assert(auc == 1.0)
  }

  test("two-phase sweep equals the single-partition window at a larger size") {
    // 999 rows over 250 distinct scores with collisions and mixed labels
    val rows = (0L until 999L).map { i =>
      (i, (i * 37L) % 250L, (i * 13L) % 3L == 0L)
    }
    val scored = rows.toDF("doc_id", "score_scaled", "is_pos")
    val naive = scored.groupBy("score_scaled").agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("n_neg"))
      .withColumn("cum_tp", sum("n_pos").over(
        org.apache.spark.sql.expressions.Window.orderBy(col("score_scaled").desc)))
      .withColumn("cum_fp", sum("n_neg").over(
        org.apache.spark.sql.expressions.Window.orderBy(col("score_scaled").desc)))
      .select("score_scaled", "n_pos", "n_neg", "cum_tp", "cum_fp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val got = Eval.rocTable(scored)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == naive)
  }

  private def kappaOf(rows: Seq[(String, String)]): (Long, Long, Double) = {
    val r = Eval.kappaReport(rows.toDF("pred", "actual")).collect().head
    (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("n_agree")),
      r.getDouble(r.fieldIndex("kappa")))
  }

  test("kappa: perfect agreement = 1, hand-computed 2x2 case, constant rater") {
    // perfect agreement, two classes
    val perfect = kappaOf(Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b")))
    assert(perfect == ((4L, 4L, 1.0)))
    // the standard worked example: n=50, agree=20+15=35,
    // marginals rows (25,25) cols (30,20) -> pe=(750+500)/2500=0.5,
    // po=0.7 -> kappa = 0.2/0.5 = 0.4
    val hand = kappaOf(
      Seq.fill(20)(("a", "a")) ++ Seq.fill(10)(("a", "b")) ++
        Seq.fill(5)(("b", "a")) ++ Seq.fill(15)(("b", "b")))
    assert(hand._1 == 50L && hand._2 == 35L)
    assert(math.abs(hand._3 - 0.4) < 1e-15, hand.toString)
    // a constant predictor agrees only by chance: kappa exactly 0
    // (n·a = 30·18? no: rows=(30),cols over... use closed form)
    // pred always "a"; actual 3 a's, 2 b's: po=0.6, pe = (5*3+0*2)/25=0.6
    val const = kappaOf(Seq(("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"), ("a", "b")))
    assert(const._3 == 0.0, const.toString)
  }

  test("kappa: a never-predicted class still contributes its row marginal") {
    // actual has class "c" but pred never says "c": the full-outer
    // marginal join must keep row_n(c) with col_n(c)=0
    val r = Eval.kappaReport(
      Seq(("a", "a"), ("a", "c"), ("b", "b"), ("b", "c")).toDF("pred", "actual"))
      .collect().head
    // n=4, agree=2, rows: a=1,b=1,c=2; cols: a=2,b=2,c=0 -> sum_rc=1*2+1*2+2*0=4
    assert(r.getString(r.fieldIndex("sum_rc")).toLong == 4L)
    // kappa = (4*2-4)/(16-4) = 4/12
    assert(r.getDouble(r.fieldIndex("kappa")) == 4.0 / 12.0)
  }

  test("knn calibration: ECE identities on the real table") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Eval.knnCalibration(emb, 0L until 500L, 5).collect().toSeq
    assert(rows.nonEmpty && rows.size <= 5)
    val get = (r: org.apache.spark.sql.Row, c: String) => r.getLong(r.fieldIndex(c))
    val nTotal = get(rows.head, "n_total")
    assert(rows.map(get(_, "n")).sum == nTotal && nTotal == 500L)
    // summary columns consistent across rows; ece_num is the gap sum
    assert(rows.map(get(_, "ece_num")).distinct.size == 1)
    assert(rows.map(get(_, "gap_num")).sum == get(rows.head, "ece_num"))
    // ECE in [0,1]; per-bin |acc-conf| = gap_num/(k*n) reproduced by the doubles
    for (r <- rows) {
      val conf = r.getDouble(r.fieldIndex("conf"))
      val acc = r.getDouble(r.fieldIndex("acc"))
      assert(conf >= 0.0 && conf <= 1.0 && acc >= 0.0 && acc <= 1.0)
      assert(math.abs(math.abs(acc - conf) -
        get(r, "gap_num").toDouble / (5.0 * get(r, "n"))) < 1e-12)
    }
    val ece = rows.head.getDouble(rows.head.fieldIndex("ece"))
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("knn calibration: a perfectly calibrated fixture has ECE 0") {
    // one clean cluster per label: every query's 5 neighbors share its
    // label -> every bin is votes=5 with acc 1.0, conf 1.0
    val emb = (0L until 60L).map { i =>
      val lab = (i % 3).toInt
      val v = Array.fill(4)(0f); v(lab) = 1f + (i / 3).toFloat * 1e-4f
      (i, v, lab)
    }.toDF("vec_id", "embedding", "label")
    val rows = Eval.knnCalibration(emb, 0L until 60L, 5).collect().toSeq
    assert(rows.size == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("votes")) == 5L)
    assert(r.getLong(r.fieldIndex("ece_num")) == 0L)
    assert(r.getDouble(r.fieldIndex("ece")) == 0.0)
  }
}
