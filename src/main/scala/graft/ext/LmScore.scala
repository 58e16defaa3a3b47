package graft.ext

import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

/** Bigram language-model document scoring — the CCNet-style quality
  * signal: train add-one-smoothed bigram statistics on the corpus itself,
  * then score each document by its total log-likelihood
  * `Σ ln (B(a,b)+1)/(U(a)+V)` over its bigram occurrences. Low scores
  * flag documents whose word transitions are unlike the corpus (boiler-
  * plate, keyword stuffing, lorem-noise); in production the counts would
  * be trained once on a reference corpus and reused.
  *
  * Scale shape: two counting aggregates (unigrams, bigrams — the word-
  * count shuffle), then the occurrence stream joins its counts keyed on
  * the bigram and on the context word — both plain equi-joins that AQE
  * can re-plan; nothing is collected but the vocabulary size. Log values
  * are integer-scaled (`round(ln·1e6)`) so per-document sums are exact
  * and engine-portable (the tf-idf recipe). */
object LmScore {

  /** (doc_id, n_bigrams, sum_logp_scaled) per document with ≥1 bigram. */
  def scoreDocuments(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.token_ngrams(col(textCol), 2)).as("g"))
    val toks = docs.select(explode(Tokenize.tokensArray(col(textCol))).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("uc"))
    val bi = grams.groupBy("g").agg(count(lit(1)).as("bc"))
    val vocab = uni.count() // the one driver-side scalar (|V| for smoothing)
    grams
      .join(bi, "g")
      .withColumn("a", split(col("g"), " ").getItem(0))
      .join(uni.withColumnRenamed("w", "a"), "a")
      .withColumn("lp_scaled",
        round(log((col("bc") + 1).cast("double") /
          (col("uc") + lit(vocab)).cast("double")) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_scaled")).as("sum_logp_scaled"))
      .orderBy("doc_id")
  }

  /** Interpolated Kneser–Ney bigram scoring — the smoothing the actual
    * CCNet/KenLM perplexity filter uses, upgrading [[scoreDocuments]]'
    * add-one baseline: `P(b|a) = max(c(a,b)−D,0)/c(a) +
    * D·N₁₊(a·)/c(a) · N₁₊(·b)/N₁₊(··)` with the standard discount
    * D = 3/4. Every scored bigram was seen in training (the corpus
    * scores itself), so c ≥ 1 and the max() never clips; with D exactly
    * ¾ the probability is the exact rational
    * `((4c−3)·NT + 3·N₁₊(a·)·N₁₊(·b)) / (4·c(a)·NT)` (NT = distinct
    * bigram types), whose ln both engines evaluate on the same two
    * nearest-doubles of the same exact integers — the integer-scaled-log
    * recipe. Unlike add-one, rare continuations of promiscuous contexts
    * (high N₁₊) are not over-penalized — the signal KenLM filters rank
    * on.
    *
    * Scale shape: one bigram-count aggregate, two bounded re-aggregations
    * of it (per-context totals/fan-out, per-continuation fan-in), then
    * the occurrence stream equi-joins its three statistics and folds per
    * document. The only driver scalar is NT (one count). The numerator
    * products run in DECIMAL(38,0): c·NT overflows a long once the
    * corpus passes ~10⁹ tokens — inside 100 TB territory. */
  def kneserNeyScoreDocuments(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val dec = "decimal(38,0)"
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.token_ngrams(col(textCol), 2)).as("g"))
    // materialize ONCE: ctx, cont, NT and the scoring join all branch off
    val bi = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("a", split(col("g"), " ").getItem(0))
      .withColumn("b", split(col("g"), " ").getItem(1))
      .pinCheckpoint()
    val ctx = bi.groupBy("a").agg(sum(col("c")).as("ca"), count(lit(1)).as("n1a"))
    val cont = bi.groupBy("b").agg(count(lit(1)).as("n1w"))
    val nTypes = bi.count() // the one driver scalar: N₁₊(··)
    grams
      .join(bi, "g")
      .join(ctx, "a")
      .join(cont, "b")
      .withColumn("lp_scaled", round(log(
        ((lit(4).cast(dec) * col("c") - lit(3).cast(dec)) * lit(nTypes).cast(dec)
          + lit(3).cast(dec) * col("n1a") * col("n1w")).cast(dec).cast("double")
          / (lit(4).cast(dec) * col("ca") * lit(nTypes).cast(dec)).cast(dec).cast("double")
        ) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_scaled")).as("sum_logp_scaled"))
      .orderBy("doc_id")
  }
}
