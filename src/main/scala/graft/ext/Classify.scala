package graft.ext

import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

/** Multinomial Naive Bayes document classifier — the classic distributed
  * text classifier (language ID, quality tiers, topic routing), trained
  * and applied entirely as DataFrame aggregations. The reference engine's
  * text analysis stops at counting (word count / inverted index:
  * `/root/reference/MapReduce.py:25-49`); this is the natural next stage a
  * training-data pipeline needs: turn those same token counts into a
  * per-class generative model and score every document against it.
  *
  * Model (add-one smoothing): for class c and word w,
  *   P(w|c) = (C(c,w) + 1) / (T(c) + V)
  *   score(d,c) = ln P(c) + Σ_w cnt(d,w) · ln P(w|c)
  * with C(c,w) the training token counts, T(c) = Σ_w C(c,w), V the corpus
  * vocabulary size, and P(c) the document-count prior.
  *
  * Determinism: every log is integer-scaled (`round(ln·1e6)` BIGINT — the
  * tf-idf/LM-score recipe), so per-document sums are exact, order-
  * independent, and engine-portable. The smoothed-unseen term ln 1 = 0
  * lets the scoring join stay sparse: words absent from class c contribute
  * only the shared `- n_tokens · lnS(T(c)+V)` normalizer, so the join
  * touches exactly the (word, class) pairs the training corpus contains.
  *
  * Scale shape: training is one (class, word) count shuffle — the word-
  * count plan keyed twice. Scoring joins the document token stream to the
  * model on `word` alone (a plain equi-join AQE can re-plan; the model is
  * vocab×classes rows, NOT broadcast — web-scale vocabularies don't fit a
  * driver). The per-class normalizers and priors are one tiny aggregate
  * (rows = number of classes), broadcast-joined onto a documents×classes
  * grid. Nothing but |V| (one long) ever reaches the driver.
  */
object Classify {

  private def lnS(x: org.apache.spark.sql.Column) =
    round(log(x.cast("double")) * 1e6).cast("long")

  /** Per-(doc, class) smoothed log-likelihood scores, all classes scored
    * for every document. Columns: doc_id, cls, score_scaled. */
  def naiveBayesScores(docs: DataFrame, textCol: String = "text",
                       labelCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), col(labelCol).as("cls"),
      explode(Tokenize.tokensArray(col(textCol))).as("word"))
    // Training counts: C(c,w), T(c), V, and the document-count prior.
    // Both count tables are materialized ONCE (vocab scalar, class
    // normalizers, and the scoring join all branch off them) so the
    // corpus is tokenized a single time, not once per consumer.
    val cw = toks.groupBy("cls", "word").agg(count(lit(1)).as("c"))
      .pinCheckpoint()
    // Two driver scalars, both metadata-scale (one long each): |V| and N.
    val vocab = cw.select("word").distinct().count()
    val nDocsTotal = docs.count()
    val clsStats = cw.groupBy("cls").agg(sum("c").as("t"))
      .join(docs.groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("n_docs")), "cls")
    val clsModel = clsStats.select(col("cls"),
      lnS(col("n_docs").cast("double") / lit(nDocsTotal).cast("double")).as("prior_scaled"),
      lnS(col("t") + lit(vocab)).as("norm_scaled"))
    // Document term vectors (hash-keyed; the raw text never re-shuffles).
    val dtf = toks.groupBy(col(idCol), col("word")).agg(count(lit(1)).as("cnt"))
      .pinCheckpoint()
    // Every document scores, including zero-token ones (n_tokens = 0 →
    // score degenerates to the class prior, argmax = max-prior class).
    val dlen = docs.select(col(idCol))
      .join(dtf.groupBy(idCol).agg(sum("cnt").as("n_tokens")), Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens"))
    // Sparse scoring join: only (word, cls) pairs present in the model.
    val hit = dtf
      .join(cw.select(col("cls"), col("word"), lnS(col("c") + 1).as("lc")), "word")
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("cnt") * col("lc")).as("hit_scaled"))
    // Dense grid: every document × every class (classes are few by nature).
    dlen.crossJoin(broadcast(clsModel))
      .join(hit, Seq(idCol, "cls"), "left")
      .select(col(idCol), col("cls"),
        (col("prior_scaled") + coalesce(col("hit_scaled"), lit(0L))
          - col("n_tokens") * col("norm_scaled")).as("score_scaled"))
  }

  /** Argmax prediction per document with a deterministic tiebreak (higher
    * score wins; equal scores break to the lexicographically smaller
    * class). Columns: doc_id, pred, score_scaled, actual, is_correct —
    * ordered by doc_id for the oracle hash. */
  def naiveBayesPredict(docs: DataFrame, textCol: String = "text",
                        labelCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol))
      .orderBy(col("score_scaled").desc, col("cls"))
    naiveBayesScores(docs, textCol, labelCol, idCol)
      .withColumn("__rn", row_number().over(byDoc))
      .filter(col("__rn") === 1)
      .join(docs.select(col(idCol), col(labelCol).as("actual")), idCol)
      .select(col(idCol), col("cls").as("pred"), col("score_scaled"),
        col("actual"), (col("cls") === col("actual")).as("is_correct"))
      .orderBy(idCol)
  }

  /** Whole-corpus confusion matrix of the NB self-eval:
    * (actual, pred, n) — the compact per-class quality report tracked
    * alongside the ROC/AUC sweep (`Eval`), mirroring the shape of the
    * centroid classifier's matrix. One |classes|²-bounded aggregation
    * over the prediction frame. */
  def naiveBayesConfusion(docs: DataFrame, textCol: String = "text",
                          labelCol: String = "lang", idCol: String = "doc_id"): DataFrame =
    naiveBayesPredict(docs, textCol, labelCol, idCol)
      .groupBy(col("actual"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "pred")

  /** Nearest-centroid (Rocchio) classification over labeled embeddings,
    * in the snapped-integer arithmetic of [[Ivf.kmeansAssignSnapped]]:
    * per-label centroids are round-half-up integer means of the snapped
    * vectors, assignment is the exact d = |c|² − 2w·c argmin (ties to the
    * lowest label), and the output is the leave-nothing-out CONFUSION
    * MATRIX (true_label, pred_label, n) — the compact quality report a
    * labeled-embedding pipeline tracks per snapshot. Everything is exact
    * integer arithmetic inside the [[Ivf.requireExactBound]] guard, so
    * the matrix is bit-identical in any engine replaying the recipe.
    *
    * Scale shape: training is ONE (label, pos) aggregation (map-side
    * partial; labels×dim rows to the driver — bounded by the label
    * cardinality, which a classifier presumes small); assignment is a
    * narrow literal-centroid projection over one corpus scan; the matrix
    * is one (true, pred) count shuffle of label²-bounded cardinality.
    *
    * The "labels are few" assumption is ENFORCED, not assumed: the
    * driver collect is labels×dim rows, so a high-cardinality column
    * passed by mistake (a doc id, a hash) would OOM the driver. The
    * guard is one tiny count-distinct aggregation; raise `maxLabels`
    * deliberately if a genuinely huge label space is intended (and size
    * the driver for maxLabels×dim rows when you do). */
  def centroidConfusion(embeddings: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        labelCol: String = "label",
                        maxLabels: Int = 1000): DataFrame = {
    val vecs = embeddings.select(col(labelCol).cast("int").as("lbl"),
      Ivf.snapVec(col(vecCol)).as("w"))
    val nLabels = vecs.agg(countDistinct(col("lbl"))).head().getLong(0)
    require(nLabels <= maxLabels,
      s"centroidConfusion: $nLabels distinct labels in '$labelCol' exceeds " +
        s"maxLabels=$maxLabels — centroid training collects labels*dim rows to " +
        "the driver, so this looks like a high-cardinality column (an id?) " +
        "passed as the label; pass the real class column, or raise maxLabels " +
        "deliberately if the label space is genuinely this large")
    Ivf.requireExactBound(vecs)
    val rows = vecs.select(col("lbl"), posexplode(col("w")))
      .groupBy("lbl", "pos")
      .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val (s, n) = (r.getLong(2), r.getLong(3))
        (r.getInt(0), (r.getInt(1), Math.addExact(Math.multiplyExact(2L, s), n) / (2 * n)))
      }
    val centroids: Seq[(Int, Seq[Long])] = rows.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1).map(_._2).toSeq }
      .toSeq.sortBy(_._1)
    if (centroids.isEmpty)
      return embeddings.sparkSession.emptyDataFrame
        .select(lit(0L).as("true_label"), lit(0L).as("pred_label"), lit(0L).as("n"))
        .limit(0)
    vecs.select(col("lbl").cast("long").as("true_label"),
        Ivf.cellOfSnapped(col("w"), centroids).cast("long").as("pred_label"))
      .groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
      .orderBy("true_label", "pred_label")
  }
}
