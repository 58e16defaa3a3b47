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
}
