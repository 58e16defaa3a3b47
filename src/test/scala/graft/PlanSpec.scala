package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the scale properties claimed in the Scaladoc must
  * actually appear in the optimized plans — filters and projections reach
  * the parquet scan, small dims broadcast, aggregates have map-side
  * partials, top-k never does a global sort. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = {
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def q(name: String): String =
    plan(SparkEntry.queries(name)(spark, sf))

  test("filter + projection are pushed into the parquet scan") {
    val p = q("q_filter_project")
    assert(p.contains("PushedFilters:") &&
      p.contains("IsNotNull(l_quantity)"), p.takeRight(800))
    // read schema pruned to the 5 referenced columns, not the full table
    assert(p.contains("l_orderkey") && !p.contains("l_shipdate"))
  }

  test("dimension joins broadcast; no shuffle of the fact side") {
    val p = q("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.takeRight(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("aggregations carry a map-side partial") {
    val p = q("wc_word_count")
    // partial + final pair of hash aggregates around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.takeRight(500))
    assert(p.contains("Exchange"))
  }

  test("global top-k is TakeOrderedAndProject, not a total sort") {
    val p = q("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p.takeRight(500))
  }

  test("semi/anti joins plan as join, not subquery re-scan") {
    assert(q("q_semi_join").contains("LeftSemi"))
    assert(q("q_anti_join").contains("LeftAnti"))
  }

  test("ORC round trip pushes the selective predicate into the ORC scan") {
    val df = SparkEntry.queries("src_orc")(spark, sf)
    val p = plan(df)
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(n_chars,120)"), p.takeRight(900))
  }

  test("HTML extraction is a pure projection: zero Exchange in either plan") {
    // pre-presentation-sort operators (the graded queries add orderBy)
    val docs = Tables.documents(spark, sf)
    val pe = plan(ext.Html.extract(ext.Html.htmlDocs(docs)))
    val pb = plan(ext.Html.blocks(ext.Html.htmlDocs(docs)))
    val pl = plan(ext.Html.links(ext.Html.htmlLinkDocs(docs)))
    val pm = plan(ext.Html.meta(ext.Html.htmlMetaDocs(docs)))
    assert(!pe.contains("Exchange"), pe.takeRight(500))
    assert(!pb.contains("Exchange"), pb.takeRight(500))
    assert(!pl.contains("Exchange"), pl.takeRight(500))
    assert(!pm.contains("Exchange"), pm.takeRight(500))
    // the block/anchor explodes are Generates over per-doc arrays,
    // still shuffle-free
    assert(pb.contains("Generate"), pb.takeRight(500))
    assert(pl.contains("Generate"), pl.takeRight(500))
  }

  test("whole-stage codegen covers the tokenizer pipeline") {
    val df = SparkEntry.queries("wc_word_count")(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // the `*(n)` star marks a WholeStageCodegen span; it must cover the
    // Generate(tokenizetext) + partial HashAggregate pipeline
    assert(p.contains("*(1) Generate explode(tokenizetext"), p)
    assert(p.contains("*(1) HashAggregate"), p)
  }

  test("brute-force topk broadcasts the query side") {
    val p = q("sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.takeRight(800))
  }

  test("correlated scalar subqueries decorrelate to joins") {
    // Catalyst must rewrite the per-row subqueries into aggregate+join —
    // a plan that re-ran the subquery per outer row would be quadratic
    val p = q("q_sql_correlated")
    assert(p.contains("Join"), p.takeRight(800))
    assert(!p.contains("ScalarSubquery"), p.takeRight(800))
  }

  test("decontamination broadcasts the benchmark n-gram side") {
    // the eval/benchmark n-gram set is the small side by construction —
    // the train-side n-gram stream must meet it in a BroadcastHashJoin,
    // never shuffle its n-gram text to a SortMergeJoin
    val p = q("pipeline_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.takeRight(800))
    assert(!p.contains("SortMergeJoin"), p.takeRight(800))
  }

  test("semantic decontamination never plans a cartesian product") {
    val p = q("pipeline_decon_embedding")
    assert(!p.contains("CartesianProduct"), p.takeRight(1200))
  }

  test("cosine pair mining never plans a cartesian product") {
    // candidates come from equi-joins on LSH buckets / IVF cell pairs; the
    // all-pairs crossJoin exists only in the *Exact small-n cross-checks
    val p = q("sim_cosine_pairs")
    assert(!p.contains("CartesianProduct"), p.takeRight(1200))
  }

  test("candidate-set ANN composition plans equi-joins, never a cartesian product") {
    // the corpus-scale form: candidates are id pairs, vectors attach via
    // two id-keyed joins — no crossJoin, no corpus broadcast required
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val cands = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "neighbor_id")
    val p = plan(graft.ext.Similarity.radiusSearch(emb, cands, 0.5, "vec_id", "embedding"))
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    val pm = plan(graft.ext.Similarity.mipsTopK(emb, cands, 5, "vec_id", "embedding"))
    assert(!pm.contains("CartesianProduct"), pm.takeRight(800))
  }

  test("prefix-filtered jaccard plans equi-joins only, no cartesian, no corpus window") {
    // candidate generation is a self-equi-join of the prefix index; the
    // per-doc ordering is an aggregation, never a window over the corpus
    val p = q("dedup_jaccard_prefix")
    assert(!p.contains("CartesianProduct"), p.takeRight(1200))
    assert(!p.contains("Window"), p.takeRight(1200))
  }

  test("scd2 extend: no scalar max-version aggregate subtree in the plan") {
    // the caller-attested newestVersion folds in as a literal; round 10's
    // plan carried 4 duplicated one-row SinglePartition aggregate pairs
    val p = q("pipeline_scd2_extend")
    assert(!p.contains("SinglePartition"),
      "no one-row scalar exchange may remain: " + p.linesIterator.filter(_.contains("SinglePartition")).mkString("; "))
  }

  test("small-graph clustering fast path plans a broadcast label join, no iterative loop") {
    // below the cap the labels come from driver union-find and join back
    // broadcast: the returned plan must contain no shuffle of the corpus
    // on the label column and exactly one join
    val nodes = spark.range(0, 100).selectExpr("id AS doc_id")
    val pairs = spark.range(0, 30).selectExpr("id AS a", "id + 1 AS b")
    val df = ext.Dedup.clusterPairs(nodes, pairs, "doc_id")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.takeRight(500))
    assert(!p.contains("SortMergeJoin"), "label attach must broadcast, not shuffle the corpus")
  }

  test("cdc apply: one aggregation + one full-outer equi-join, no window over the log") {
    val p = q("pipeline_cdc_apply")
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    assert(!p.contains("Window"), p.takeRight(800))
    assert(p.contains("FullOuter"), p.takeRight(800))
    // winner-per-key is an aggregation (SortAggregate: max over a struct
    // has no mutable hash buffer) and still carries a map-side partial
    assert(p.contains("SortAggregate") || p.contains("HashAggregate"), p.takeRight(800))
    assert(p.contains("partial_max") || p.contains("Partial"), p.takeRight(2000))
  }

  test("preference pairs: grouped struct-argmax aggregation, no window, no self-join") {
    // the graded query rides the bigram-LM signal (corpus-level counting
    // joins by design); the windowless argmax/argmin pairing invariant
    // must hold for it too
    val p = q("pipeline_preference_pairs")
    assert(!p.contains("Window"), p.takeRight(800))
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    // the stopword-proxy form keeps the one-corpus-scan shape: both pair
    // ends ride ONE scan (formatted explain names each scan twice: once
    // in the tree, once as the node-detail header)
    val sp = plan(graft.ext.TrainingPipeline.preferencePairs(Tables.documents(spark, sf)))
    assert(!sp.contains("Window") && !sp.contains("CartesianProduct"), sp.takeRight(800))
    assert("Scan parquet".r.findAllIn(sp).size == 2, sp.takeRight(1200))
  }

  test("vocabulary id assignment has no single-partition exchange") {
    // the two-phase ranking must never funnel the dictionary through one
    // task: no SinglePartition exchange anywhere (the presentation sort is
    // a range exchange; the local ranking window is hash-partitioned).
    // The ranking subplan is checked pre-materialization (rankedVocab
    // checkpoints it), then the assembled queries end-to-end.
    val docs = Tables.documents(spark, sf)
    val ranking = graft.ext.TextStats.localRankedVocab(docs, "text")
    assert(!plan(ranking).contains("SinglePartition"), plan(ranking).takeRight(1500))
    val vocab = graft.ext.TextStats.vocabulary(docs)
    assert(!plan(vocab).contains("SinglePartition"), plan(vocab).takeRight(1500))
    val enc = graft.ext.TextStats.encodeDocumentsFlat(docs)
    assert(!plan(enc).contains("SinglePartition"), plan(enc).takeRight(1500))
  }

  test("group-stats operators broadcast the tiny stats side back to the fact scan") {
    // per-group bounds/moments are a handful of rows; the re-join must
    // never shuffle the fact table on the group key
    val o = q("q_outliers")
    assert(o.contains("BroadcastHashJoin"), o.takeRight(800))
    assert(!o.contains("SortMergeJoin"), o.takeRight(800))
    val w = q("q_winsorize")
    assert(w.contains("BroadcastHashJoin"), w.takeRight(800))
    assert(!w.contains("SortMergeJoin"), w.takeRight(800))
    // the heavy-hitter scalar total rides a broadcast nested-loop join
    val h = q("q_heavy_hitters")
    assert(h.contains("BroadcastNestedLoopJoin") || h.contains("BroadcastHashJoin"),
      h.takeRight(800))
  }

  test("curriculum's global rank has no single-partition exchange") {
    // a bare Window.orderBy(score) would plan SinglePartition; the
    // two-phase count prefix sum must not. The pre-checkpoint subplan is
    // the load-bearing check (the materialized query's lineage is cut).
    import org.apache.spark.sql.functions.{col, lit, size, filter => afilter}
    val docs = Tables.documents(spark, sf)
    val toks = graft.text.Tokenize.tokensArray(col("text"))
    val base = docs.select(col("doc_id"),
        (size(afilter(toks, t => t.isin(graft.ext.TextStats.Stopwords: _*))).cast("double") /
          size(toks).cast("double")).as("score"))
      .withColumn("n_tokens", lit(1L))
    val pre = graft.ext.TrainingPipeline.localCumsum(
      base, Seq(col("score").desc, col("doc_id").asc), 8)
    assert(!plan(pre).contains("SinglePartition"), plan(pre).takeRight(1500))
    val full = q("pipeline_curriculum")
    assert(!full.contains("CartesianProduct"), full.takeRight(800))
  }

  test("group rank has neither a single-partition nor a per-group-partitioned exchange") {
    // the naive row_number() OVER (PARTITION BY lang) plans
    // hashpartitioning(lang) — one task per LANGUAGE holding a whole
    // group; the group-aware two-phase form must range-partition by
    // (lang, id) instead
    val docs = Tables.documents(spark, sf)
    val pre = graft.ext.TrainingPipeline.groupRankLocal(docs, "lang", "doc_id")
    val p = plan(pre)
    assert(!p.contains("SinglePartition"), p.takeRight(1500))
    assert(p.contains("rangepartitioning"), p.takeRight(1500))
    assert(!p.contains("hashpartitioning(lang"),
      "window must not repartition by the group column alone: " + p.takeRight(1000))
    val full = q("pipeline_oversample")
    assert(!full.contains("CartesianProduct"), full.takeRight(800))
  }

  test("sequence packing's global prefix sum has no single-partition exchange") {
    // the naive Window.orderBy(id) cumsum would plan SinglePartition; the
    // two-phase form must not (the output presentation sort is a range
    // exchange, which is fine)
    val docs = Tables.documents(spark, sf)
    import org.apache.spark.sql.functions.{col, size}
    val base = docs.select(col("doc_id"),
      size(graft.text.Tokenize.tokensArray(col("text"))).cast("long").as("n_tokens"))
    val pre = graft.ext.TrainingPipeline.localCumsum(base, "doc_id", 8)
    assert(!plan(pre).contains("SinglePartition"), plan(pre).takeRight(1500))
    val packed = graft.ext.TrainingPipeline.packSequences(docs, 2048)
    assert(!plan(packed).contains("SinglePartition"), plan(packed).takeRight(1500))
  }

  test("ROC sweep's cumulative TP/FP has no single-partition exchange") {
    // a bare Window.orderBy(score desc) over the distinct-score frame
    // would plan SinglePartition; the two-phase form must not (the final
    // presentation sort is a range exchange, which is fine)
    import org.apache.spark.sql.functions.col
    val scored = spark.range(0, 2000).select(
      col("id").as("doc_id"), (col("id") * 37 % 500).as("score_scaled"),
      (col("id") % 3 === 0).as("is_pos"))
    val roc = graft.ext.Eval.rocTable(scored)
    val p = plan(roc)
    assert(!p.contains("SinglePartition"), p.takeRight(1500))
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    // AUC folds the table to ONE row — that scalar agg is the allowed
    // one-row SinglePartition (like every scalar-total query)
    val auc = plan(graft.ext.Eval.aucReport(scored))
    assert(!auc.contains("CartesianProduct"), auc.takeRight(800))
  }

  test("label propagation rounds use node-keyed joins, no product, no window") {
    import spark.implicits._
    val edges = (0L until 300L).map(i => (s"n${i % 100}", s"n${(i * 7) % 100}", 1L))
      .toDF("src", "dst", "w")
    val p = plan(graft.ext.Graph.labelPropagation(edges, 3))
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.takeRight(800))
    assert(!p.contains("Window"), "LPA must aggregate, not window: " + p.takeRight(800))
  }

  test("TPC-H anchors: Q3 broadcasts filtered dims + top-k; Q18 aggregates before the rejoin") {
    val p3 = q("q3_shipping_priority")
    assert(p3.contains("TakeOrderedAndProject"), p3.takeRight(800))
    assert(p3.contains("BroadcastHashJoin"), p3.takeRight(800))
    val p18 = q("q18_large_orders")
    // the HAVING filter must sit on the aggregate, upstream of the joins:
    // the plan joins the few surviving keys, never the raw fact table
    assert(p18.contains("(sum_qty"), p18.takeRight(800))
    assert(!p18.contains("CartesianProduct"), p18.takeRight(800))
  }

  test("weighted sample and BM25 plan their top-k as TakeOrderedAndProject") {
    val ws = q("pipeline_weighted_sample")
    assert(ws.contains("TakeOrderedAndProject"), ws.takeRight(800))
    assert(!ws.contains("SinglePartition"), ws.takeRight(800))
    val bm = q("text_bm25")
    assert(bm.contains("TakeOrderedAndProject"), bm.takeRight(800))
  }

  test("PageRank rounds use node-keyed joins, never a cartesian/NLJ product") {
    val p = q("graph_pagerank")
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    // the class of joins in a round: equi-joins on src/node keys
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p.takeRight(800))
  }

  test("snapped kmeans: narrow literal-centroid assignment, broadcast sizes, no cartesian") {
    // centroids are driver-sized literals baked into the argmin
    // expression, so the assignment pass must plan as a scan + project —
    // the only join is the tiny per-cell size table, broadcast back
    val p = q("sim_kmeans")
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    assert(p.contains("BroadcastHashJoin"), p.takeRight(800))
    assert(!p.contains("SortMergeJoin"), p.takeRight(800))
  }

  test("diversity cap plans a bounded per-cell aggregation, not a cell-partitioned window") {
    // with nlist cells, a row_number window partitioned by cell would
    // funnel the whole corpus through nlist hot partitions; the
    // TopKAggregator path must plan as a partial-then-final object agg
    val p = q("pipeline_diversity")
    assert(!p.contains("Window"), p.takeRight(1200))
    assert(p.contains("ObjectHashAggregate"), p.takeRight(1200))
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
  }

  test("Naive Bayes broadcasts only the class grid, and never collects the model") {
    // the dense doc×class grid is the broadcast side (classes are few);
    // the model join key is `word` — a plain equi-join, not a cartesian
    val p = q("text_nb")
    assert(!p.contains("CartesianProduct"), p.takeRight(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.takeRight(800))
  }

  test("crawl frontier: no SinglePartition stage, no window, gate is an expression not a join") {
    val p = q("pipeline_crawl_frontier")
    // the only shuffles: the canonical-url hash agg + the presentation
    // range sort — never a single-partition collapse
    assert(!p.contains("SinglePartition"), p.takeRight(800))
    // the robots longest-match winner is a closed-form when-chain, so
    // the whole chain plans with NO join of any kind and no window
    assert(!p.contains("Window"), p.takeRight(800))
    assert(!p.contains("Join"), p.takeRight(800))
    // frontier dedup is a real partial+final hash aggregation
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.takeRight(800))
    assert(p.contains("hashpartitioning"), p.takeRight(800))
  }

  test("politeness waves: host-partitioned window, no SinglePartition") {
    val p = q("url_politeness")
    assert(p.contains("Window"), p.takeRight(500))
    assert(p.contains("hashpartitioning(host"), p.takeRight(800))
    assert(!p.contains("SinglePartition"), p.takeRight(800))
  }
}
