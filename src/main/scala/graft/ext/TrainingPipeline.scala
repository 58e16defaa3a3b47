package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-cleaning composite a pre-training data pipeline
  * runs: quality gate → exact dedup → near-dup clustering with
  * keep-one-per-cluster → cleaned corpus + per-stage accounting.
  *
  * Stage order matters at scale: the cheap per-document quality gate runs
  * first (narrow scan, no shuffle) so the dedup machinery only ever sees
  * surviving documents; exact dedup (hash groupBy) then collapses the
  * bulk duplicate mass before MinHash/LSH touches anything.
  */
object TrainingPipeline {

  /** Cleaned corpus: documents that pass the quality gate and are the
    * retained representative of their near-dup cluster. */
  def cleanCorpus(docs: DataFrame, nearDupThreshold: Double = 0.7,
                  minTokens: Int = 10): DataFrame = {
    val quality = TextStats.qualityScores(docs)
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") >= 0.01 && col("digit_ratio") <= 0.5)
      .select("doc_id")
    val qualified = docs.join(quality, "doc_id")
    val keep = Dedup.nearDupKeepIds(qualified, nearDupThreshold)
    qualified.join(keep, "doc_id").orderBy("doc_id")
  }

  /** Per-stage accounting (one row): how many documents each stage
    * removed — the numbers a data curator reports. */
  def stageReport(docs: DataFrame, nearDupThreshold: Double = 0.7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val total = docs.count()
    val quality = TextStats.qualityScores(docs).filter(col("quality_ok")).select("doc_id")
    val nQuality = quality.count()
    val qualified = docs.join(quality, "doc_id")
    val nExact = Dedup.exactKeepIds(qualified).count()
    val nFinal = Dedup.nearDupKeepIds(qualified, nearDupThreshold).count()
    Seq((total, nQuality, nExact, nFinal,
        total - nQuality, nExact - nFinal))
      .toDF("n_input", "n_quality_pass", "n_after_exact_dedup", "n_retained",
        "n_quality_dropped", "n_neardup_dropped")
  }
}
