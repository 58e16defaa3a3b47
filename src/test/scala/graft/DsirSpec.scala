package graft

import org.apache.spark.sql.functions._

/** DSIR importance selection: exact-arithmetic fixture (independent
  * Scala reimplementation of the weight formula), ordering sanity,
  * degenerate inputs, and partitioning invariance. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256
  private val P = 1000000007L

  /** Independent re-computation of the engine's hashed-feature stream:
    * normalized non-empty tokens + adjacent bigrams, Horner hash. */
  private def feats(text: String): Seq[Long] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
      .map(_.toLowerCase.replaceAll("[^\\p{L}\\p{N}]+", "")).filter(_.nonEmpty).toSeq
    val f = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    f.map(_.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P) % B)
  }

  test("dsir: exact weights vs an independent reimplementation") {
    // target (en) and raw-only (de) vocabularies are disjoint, so every
    // en feature has ct == cr (log-ratio 0, positive smoothing constant)
    // and every de feature has ct == 0 (negative log-ratio) — en docs
    // must outrank de docs
    val corpus = Seq(
      (0L, "alpha beta alpha beta", "en"),
      (1L, "alpha beta gamma", "en"),
      (2L, "delta epsilon delta zeta", "de"),
      (3L, "delta zeta epsilon", "de"),
      (4L, "", "de"))
    val docs = corpus.toDF("doc_id", "text", "lang")
    val out = ext.Dsir.importanceSelect(docs, col("lang") === "en",
        nBuckets = B, selectN = 2)
      .select("doc_id", "is_target", "n_feats", "score_scaled", "rank", "selected")
      .as[(Long, Boolean, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    // ground truth from the independent reimplementation
    val perDoc = corpus.map { case (id, t, _) => id -> feats(t) }.toMap
    val target = corpus.filter(_._3 == "en").map(_._1).toSet
    val cr = perDoc.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = perDoc.filter(d => target(d._1)).values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tr = cr.values.sum; val tt = ct.values.sum
    def score(id: Long): Long =
      perDoc(id).groupBy(identity).map { case (b, occ) =>
        val n = occ.size.toLong
        math.round(n * (math.log(ct.getOrElse(b, 0L) + 1d) - math.log(cr(b) + 1d)
          + math.log(tr.toDouble + B) - math.log(tt.toDouble + B)) * 1e6)
      }.sum

    assert(out.size == 5)
    for ((id, _, _) <- corpus) {
      assert(out(id)._3 == perDoc(id).size, s"n_feats of doc $id")
      assert(out(id)._4 == score(id), s"score of doc $id")
      assert(out(id)._2 == target(id))
    }
    // the empty doc has no features and scores zero
    assert(out(4L)._3 == 0L && out(4L)._4 == 0L)
    // rank is exactly the (score desc, id asc) permutation; top-2 selected
    val want = corpus.map(_._1).sortBy(id => (-score(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    for ((id, _, _) <- corpus) {
      assert(out(id)._5 == want(id), s"rank of doc $id")
      assert(out(id)._6 == (want(id) <= 2L), s"selected of doc $id")
    }
    // target-vocabulary docs outrank the off-target ones in this fixture
    assert(Set(out(0L), out(1L)).forall(_._6), "en docs should be selected")
  }

  test("dsir: partitioning invariance and selection-count bound") {
    val docs = (0L until 40L).map { i =>
      (i, s"tok${i % 7} tok${(i * 3) % 7} tok${(i * 5) % 11}",
        if (i % 3 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val a = ext.Dsir.importanceSelect(docs, col("lang") === "en", selectN = 10)
      .collect().map(_.toString).toSeq
    val b = ext.Dsir.importanceSelect(docs.repartition(13), col("lang") === "en",
      selectN = 10).collect().map(_.toString).toSeq
    assert(a == b, "score/rank must be a pure function of the corpus")
    val sel = ext.Dsir.importanceSelect(docs, col("lang") === "en", selectN = 10)
      .filter(col("selected")).count()
    assert(sel == 10L)
    // selectN beyond the corpus: everything selected, ranks still dense
    val all = ext.Dsir.importanceSelect(docs, col("lang") === "en", selectN = 1000)
    assert(all.filter(col("selected")).count() == 40L)
    assert(all.agg(max("rank")).as[Long].head() == 40L)
  }
}
