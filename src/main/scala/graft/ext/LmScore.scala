package graft.ext

import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
