package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

/** Data Selection with Importance Resampling (DSIR): score every raw
  * document by how much more likely its hashed-n-gram bag is under a
  * target-domain distribution than under the raw-corpus distribution,
  * then keep the top-scoring documents. The published recipe (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * 2023) is THE standard way to carve a domain-matched training subset
  * out of a 100 TB crawl without training a classifier first.
  *
  * Feature space: unigrams plus adjacent bigrams of the engine's
  * normalized token stream, hashed by the same Horner fold as
  * [[TextStats.hashingTf]] into `nBuckets` buckets — fixed-width,
  * vocabulary-free, so the two distributions are estimated by ONE
  * corpus-wide bucket histogram each, never a vocabulary join.
  *
  * Log importance weight of document x (add-one smoothing over the
  * bucket space):
  * {{{
  *   log w(x) = Σ_b n_b(x) · (ln(ct_b + 1) − ln(cr_b + 1)
  *                            + ln(Tr + B) − ln(Tt + B))
  * }}}
  * where ct/cr are target/raw bucket counts, Tt/Tr the total feature
  * counts and B the bucket count. Each per-(doc, bucket) contribution
  * is scaled to an integer (×1e6, rounded) BEFORE summation, so the
  * per-document score is an order-free BIGINT sum — engine-portable and
  * deterministic under any partitioning, the same treatment the tf-idf
  * scoring uses.
  *
  * Scale shape: the bucket histogram (`nBuckets` rows) and the two
  * scalar totals (one row) are the ONLY global state — both broadcast.
  * The per-document work is one hash-explode and two hash-keyed
  * aggregations; the final top-N selection reuses the two-phase global
  * rank (no corpus-wide SinglePartition window).
  */
object Dsir {

  /** Per-document hashed features: non-empty normalized unigrams plus
    * adjacent bigrams (space-joined), Horner-hashed mod `nBuckets`.
    * Returns (idCol, is_target, bucket). */
  private def hashedFeatures(docs: DataFrame, targetPred: Column, nBuckets: Int,
                             prime: Long, idCol: String, textCol: String): DataFrame = {
    val toks = filter(graft.text.Tokenize.tokensArray(col(textCol)), t => length(t) > 0)
    val bigrams = when(size(col("toks")) >= 2,
      zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), targetPred.as("is_target"), toks.as("toks"))
      .select(col(idCol), col("is_target"),
        explode(concat(col("toks"), bigrams)).as("feat"))
      // codegen'd Horner fold (identical arithmetic to the interpreted
      // aggregate-over-sequence form — FunctionsSpec pins it; swapping
      // it in cut this operator's bench time ~2x)
      .select(col(idCol), col("is_target"),
        (graft.functions.poly_hash(col("feat"), prime) % nBuckets).as("bucket"))
  }

  /** DSIR importance weights + top-N selection. One row per input
    * document: provenance flag, feature count, integer-scaled log
    * importance weight, global rank (1 = most target-like) and the
    * `selected` bit for the top `selectN`. Documents with zero features
    * score 0 and rank below every positive-scoring document. */
  def importanceSelect(docs: DataFrame, targetPred: Column, nBuckets: Int = 256,
                       prime: Long = 1000000007L, selectN: Int = 200,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets > 0 && prime > 0 && selectN > 0,
      "nBuckets, prime and selectN must be positive")
    val hashed = hashedFeatures(docs, targetPred, nBuckets, prime, idCol, textCol)
    // ONE scan of the (expensive) feature stream: the per-doc counts
    // keep is_target (functionally dependent on the id), and the global
    // histogram folds from them — re-aggregating nBuckets-keyed partials,
    // never re-hashing the corpus
    val perDocBucket = hashed.groupBy(col(idCol), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .pinCheckpoint()
    val bucketHist = perDocBucket.groupBy(col("bucket"))
      .agg(sum(col("n")).as("cr"),
        sum(when(col("is_target"), col("n")).otherwise(0L)).as("ct"))
    // both totals from the one histogram frame, computed ONCE (a single
    // one-row scalar aggregate, not one per use)
    val totals = bucketHist.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val contrib = perDocBucket
      .join(broadcast(bucketHist), Seq("bucket"))
      .crossJoin(broadcast(totals))
      // integer-scaled BEFORE the sum: BIGINT addition is order-free, so
      // the score is identical under any partitioning / fold order
      .withColumn("c", expr(
        s"CAST(round(n * (ln(ct + 1) - ln(cr + 1) + ln(tr + $nBuckets) - ln(tt + $nBuckets))" +
          " * 1000000.0) AS BIGINT)"))
    val perDoc = contrib.groupBy(col(idCol))
      .agg(sum(col("n")).as("n_feats"), sum(col("c")).as("score_scaled"))
    val full = docs.select(col(idCol), targetPred.as("is_target"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("is_target"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_scaled"), lit(0L)).as("score_scaled"))
    val ranked = TrainingPipeline.globalRank(
      full.select(col(idCol), col("score_scaled").as("score")), idCol)
    full.join(ranked, Seq(idCol))
      .select(col(idCol), col("is_target"), col("n_feats"), col("score_scaled"),
        col("rank"), (col("rank") <= selectN).as("selected"))
      .orderBy(idCol)
  }
}
