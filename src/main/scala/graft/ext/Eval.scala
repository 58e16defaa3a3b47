package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation at corpus scale — the ROC curve and exact AUC of
  * a binary scorer, the graded quality report a pipeline needs before it
  * trusts a model-based filter (language detector, quality classifier) to
  * gate 100 TB of data. The scorer under evaluation here is the
  * [[Classify.naiveBayesScores]] one-vs-rest detector (positive class =
  * one language), so the whole chain — train counts → integer-scaled
  * scores → ranked sweep → AUC — is exact and engine-portable.
  *
  * Scale shape: collapsing the corpus to one row per distinct score is a
  * hash aggregation (the word-count shuffle). The cumulative TP/FP sweep
  * is the scale hazard — a bare `Window.orderBy(score)` plans as ONE
  * partition holding every distinct score — so it runs as the two-phase
  * prefix sum (range-partition by score desc, bounded per-partition
  * windows, a P-row triangle join of partition subtotals broadcast back;
  * the same machinery as `TrainingPipeline.packSequences`). AUC then
  * folds the ROC table into four exact integer aggregates; the pair
  * products are accumulated in DECIMAL(38,0) (longs overflow once
  * P·N ≳ 9·10¹⁸, i.e. well inside 100 TB territory) and the only double
  * is the final ratio, computed from the same exact integers on both
  * engines so the nearest-double agrees bit-for-bit.
  */
object Eval {

  /** One-vs-rest binary scoring frame for the ROC/AUC report:
    * (doc_id, score_scaled, is_pos) where `score_scaled` is the NB
    * log-likelihood of `posCls` and `is_pos` marks documents whose label
    * IS `posCls`. Self-scored on the corpus's own labels — the shape of
    * a filter-calibration run, where the labeled slice grades the model
    * that will gate the unlabeled rest. */
  def binaryNbScores(docs: DataFrame, posCls: String = "en",
                     labelCol: String = "lang", idCol: String = "doc_id"): DataFrame =
    Classify.naiveBayesScores(docs, labelCol = labelCol, idCol = idCol)
      .filter(col("cls") === posCls)
      .join(docs.select(col(idCol), (col(labelCol) === posCls).as("is_pos")), idCol)
      .select(col(idCol), col("score_scaled"), col("is_pos"))

  /** ROC sweep table: one row per distinct score, descending, with the
    * per-score class counts and cumulative TP/FP at the "predict positive
    * iff score ≥ s" threshold. Columns:
    * (score_scaled, n_pos, n_neg, cum_tp, cum_fp). A null label counts
    * as negative (same CASE fall-through as the oracle). */
  def rocTable(scored: DataFrame): DataFrame = {
    val h = scored.groupBy("score_scaled").agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("n_neg"))
    val nParts = scored.sparkSession.sessionState.conf.numShufflePartitions
    val localW = Window.partitionBy("__pid").orderBy(col("score_scaled").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // materialize ONCE: the offsets branch and the final projection must
    // observe the same range-partitioner sample (the packSequences rule)
    val local = h.repartitionByRange(nParts, col("score_scaled").desc)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ltp", sum(col("n_pos")).over(localW))
      .withColumn("__lfp", sum(col("n_neg")).over(localW))
      .localCheckpoint(true)
    val sizes = local.groupBy(col("__pid"))
      .agg(sum(col("n_pos")).as("__p"), sum(col("n_neg")).as("__n"))
    val offsets = sizes.as("x")
      .join(sizes.as("y"), col("y.__pid") < col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(coalesce(sum(col("y.__p")), lit(0L)).as("__offp"),
        coalesce(sum(col("y.__n")), lit(0L)).as("__offn"))
    local.join(broadcast(offsets), "__pid")
      .select(col("score_scaled"), col("n_pos"), col("n_neg"),
        (col("__offp") + col("__ltp")).as("cum_tp"),
        (col("__offn") + col("__lfp")).as("cum_fp"))
      .orderBy(col("score_scaled").desc)
  }

  /** Decile lift table — the third standard calibration artifact next to
    * [[rocTable]] and [[aucReport]]: documents ranked by score (desc,
    * doc_id ties), cut into `buckets` equal rank slices
    * (`bucket = (rank−1)·buckets // N`), each reporting its size,
    * positive count and exact positive rate. A well-ordered scorer shows
    * monotonically falling rates; the top bucket's rate ÷ base rate is
    * the "lift" a filter owner quotes.
    *
    * Scale shape: the global rank is the two-phase prefix sum
    * (`TrainingPipeline.globalRank` — no corpus-wide window); N is one
    * scalar count; the fold is a `buckets`-row aggregation. */
  def liftTable(scored: DataFrame, buckets: Int = 10): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val ranked = TrainingPipeline.globalRank(
      scored.select(col("doc_id"), col("score_scaled").as("score")), "doc_id")
    val n = scored.count() // driver scalar: corpus size
    scored.join(ranked, "doc_id")
      .withColumn("bucket", expr(s"((rank - 1) * $buckets) div $n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n").cast("double"))
      .orderBy("bucket")
  }

  /** Exact AUC from the [[rocTable]] sweep, as a one-row report:
    * (n_pos, n_neg, auc_num2, auc_den2, auc). AUC is the Mann–Whitney
    * probability P(score⁺ > score⁻) with ties at half weight; doubling
    * both sides keeps it integral:
    * `auc_num2 = Σ_s n_pos(s)·(2·(N − cum_fp(s)) + n_neg(s))`
    *          `= 2·P·N − 2·Σ n_pos·cum_fp + Σ n_pos·n_neg`,
    * `auc_den2 = 2·P·N`, `auc = num2/den2`. The expansion needs no
    * second pass — one aggregate over the ROC table. An all-one-class
    * input yields den2 = 0 and a NaN/∞ ratio on both engines; callers
    * grading degenerate slices should check n_pos/n_neg first. */
  def aucReport(scored: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    rocTable(scored)
      .agg(sum(col("n_pos")).cast(dec).as("__P"),
        sum(col("n_neg")).cast(dec).as("__N"),
        sum((col("n_pos") * col("cum_fp")).cast(dec)).as("__C"),
        sum((col("n_pos") * col("n_neg")).cast(dec)).as("__T"))
      .select(col("__P").cast("long").as("n_pos"),
        col("__N").cast("long").as("n_neg"),
        (lit(2).cast(dec) * col("__P") * col("__N") - lit(2).cast(dec) * col("__C")
          + col("__T")).cast(dec).as("auc_num2"),
        (lit(2).cast(dec) * col("__P") * col("__N")).cast(dec).as("auc_den2"))
      .withColumn("auc",
        col("auc_num2").cast("double") / col("auc_den2").cast("double"))
  }
}
