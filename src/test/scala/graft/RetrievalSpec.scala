package graft

import graft.ext.{Retrieval, Similarity, TextStats}
import org.apache.spark.sql.functions._

/** Hybrid RRF retrieval: fusion arithmetic against a pure-Scala model of
  * the two input lists, planted disagreement between lexical and
  * semantic rankings, and determinism. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 8 docs: 0-2 mention "alpha" with different densities (lexical list);
  // embeddings: vec 3 and 4 nearly parallel to the query vec 0, the
  // lexical hits nearly orthogonal — the two lists disagree by design
  private def fixture = {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha alpha alpha beta"),
      (2L, "alpha delta"),
      (3L, "epsilon zeta"),
      (4L, "eta theta"),
      (5L, "iota kappa"),
      (6L, "lambda mu"),
      (7L, "nu xi")
    ).toDF("doc_id", "text")
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val embs = Seq(
      (0L, v(1.0, 0.0)), (1L, v(0.0, 1.0)), (2L, v(0.1, 1.0)),
      (3L, v(1.0, 0.05)), (4L, v(1.0, 0.1)), (5L, v(0.5, 0.5)),
      (6L, v(0.3, 0.7)), (7L, v(-1.0, 0.2))
    ).toDF("vec_id", "embedding")
    (docs, embs)
  }

  test("fusion == pure-Scala RRF over the two independently-computed lists") {
    val (docs, embs) = fixture
    val (k, kEach, rrfK) = (6, 4, 60)
    val lex = TextStats.bm25(docs, Seq("alpha"), kEach)
      .select("doc_id").as[Long].collect().toSeq // already (score desc, id) ordered
    val sem = Similarity.bruteForceTopK(embs, Seq(0L), kEach)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    def contrib(rank: Int): Long = math.floor(1e12 / (rrfK + rank + 1)).toLong
    val model = (lex.zipWithIndex.map { case (d, i) => d -> contrib(i) } ++
        sem.zipWithIndex.map { case (d, i) => d -> contrib(i) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (d, s) => (-s, d) }.take(k)
    val got = Retrieval.hybridTopK(docs, embs, Seq("alpha"), 0L, k, kEach, rrfK)
      .select("doc_id", "rrf_scaled").as[(Long, Long)].collect().toSeq
    assert(got == model, s"got $got, model $model")
    // the lists genuinely disagree: the lexical winner is not the
    // semantic winner (otherwise this fixture tests nothing)
    assert(lex.head != sem.head)
    // a doc on BOTH lists must carry both contributions
    val both = (lex.toSet & sem.toSet)
    assert(both.isEmpty || got.exists { case (d, s) => both(d) && s > contrib(0) })
  }

  test("single-list docs carry null for the missing rank; determinism") {
    val (docs, embs) = fixture
    val r = Retrieval.hybridTopK(docs, embs, Seq("alpha"), 0L, 8, 4)
    val rows = r.select("doc_id", "lex_rank", "sem_rank")
      .as[(Long, Option[Long], Option[Long])].collect()
    assert(rows.exists(t => t._2.isDefined && t._3.isEmpty),
      "a lexical-only doc must have null sem_rank")
    assert(rows.exists(t => t._2.isEmpty && t._3.isDefined),
      "a semantic-only doc must have null lex_rank")
    assert(rows.forall(t => t._2.isDefined || t._3.isDefined))
    val again = Retrieval.hybridTopK(docs, embs, Seq("alpha"), 0L, 8, 4)
      .collect().toSeq
    assert(r.collect().toSeq == again)
  }
}
