package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical list and a
  * semantic list — the standard first-stage shape for RAG-style data
  * curation, where BM25 catches exact terminology and the embedding list
  * catches paraphrase, and rank fusion needs no score calibration
  * between the two (Cormack et al. 2009: score = Σ 1/(K + rank)).
  *
  * Exactness: ranks are integers, and each list's contribution is
  * floor(1e12 / (K + rank)) — exact integer arithmetic end-to-end
  * (quotients ≪ 2^53, floor has no rounding half-cases), so fusion
  * scores and the fused ordering replay bit-for-bit in the SQL oracle.
  *
  * Scale shape: both retrievers are the engine's existing exact paths
  * (BM25's broadcast-df chain; broadcast-query cosine with bounded
  * top-k). The fusion itself joins two ≤ kEach-row frames — driver-scale
  * by construction, so the final rank windows run over k-row inputs, not
  * the corpus.
  */
object Retrieval {

  /** Top-k fusion of BM25(`terms`) and cosine-to-`queryVecId` lists.
    * `embeddings.vec_id` must share the id space of `docs.doc_id` (the
    * testdata aligns them). The semantic list excludes the query row
    * itself (a self-hit carries no information); the lexical list keeps
    * it — the query vector is a probe for the info need, not a document
    * to hide. Returns (id, lex_rank, sem_rank, rrf_scaled), ranks null
    * where a document appears in only one list. */
  def hybridTopK(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
                 queryVecId: Long, k: Int = 10, kEach: Int = 50, rrfK: Int = 60,
                 idCol: String = "doc_id"): DataFrame = {
    require(kEach > 0 && k > 0 && rrfK >= 0, "k, kEach must be positive; rrfK non-negative")
    // the window re-ranks the ALREADY-LIMITED kEach-row BM25 result: a
    // single-partition sort over ≤ kEach rows, bounded by construction
    // (never the corpus — TextStats.bm25 does the corpus-scale top-k).
    // The partition key is a non-foldable constant-zero expression: it
    // makes the bounded single partition EXPLICIT so WindowExec's
    // empty-spec WARN stays out of the bench tail (a bare literal would
    // constant-fold back to an empty spec).
    val lex = TextStats.bm25(docs, terms, kEach, idCol = idCol)
      .select(col(idCol), row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(pmod(col(idCol), lit(1L)))
            .orderBy(col("score_scaled").desc, col(idCol)))
        .cast("long").as("lex_rank"))
    val sem = Similarity.bruteForceTopK(embeddings, Seq(queryVecId), kEach)
      .select(col("neighbor_id").as(idCol), col("rank").as("sem_rank"))
    def rrf(rank: Column): Column =
      floor(lit(1e12) / (lit(rrfK).cast("double") + rank.cast("double"))).cast("long")
    lex.join(sem, Seq(idCol), "full_outer")
      .select(col(idCol), col("lex_rank"), col("sem_rank"),
        (coalesce(rrf(col("lex_rank")), lit(0L)) +
          coalesce(rrf(col("sem_rank")), lit(0L))).as("rrf_scaled"))
      .orderBy(col("rrf_scaled").desc, col(idCol))
      .limit(k)
  }
}
