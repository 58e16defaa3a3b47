package graft

import graft.apps.WordCount
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Scale-technique demonstrations verified for CORRECTNESS here and for
  * plan shape where observable: salting, partition-local sort, bucketed
  * co-located joins. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("new operators are invariant under input repartitioning") {
    // a distributed operator's result must never depend on how the input
    // happens to be partitioned — the strongest determinism property a
    // cluster run exercises
    val docs = Tables.documents(spark, sf)
    val skewed = docs.repartition(7, col("lang"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq
    assert(rows(graft.ext.Classify.naiveBayesPredict(docs)) ==
      rows(graft.ext.Classify.naiveBayesPredict(skewed)))
    assert(rows(graft.ext.Graph.wordPageRank(docs, 3)) ==
      rows(graft.ext.Graph.wordPageRank(skewed, 3)))
    assert(rows(graft.ext.TrainingPipeline.weightedSample(docs, 20)) ==
      rows(graft.ext.TrainingPipeline.weightedSample(skewed, 20)))
    assert(rows(graft.ext.TrainingPipeline.tokenBudget(docs, 2000)) ==
      rows(graft.ext.TrainingPipeline.tokenBudget(skewed, 2000)))
    assert(rows(graft.ext.TrainingPipeline.dataCard(docs)) ==
      rows(graft.ext.TrainingPipeline.dataCard(skewed)))
    assert(rows(graft.ext.Graph.wordDegreeStats(docs)) ==
      rows(graft.ext.Graph.wordDegreeStats(skewed)))
    val emb = Tables.embeddings(spark, sf)
    assert(rows(graft.ext.Similarity.quantizeInt8(emb)) ==
      rows(graft.ext.Similarity.quantizeInt8(emb.repartition(5))))
  }

  test("round-6 operators are invariant under input repartitioning") {
    val docs = Tables.documents(spark, sf)
    val skewed = docs.repartition(7, col("lang"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq
    // batched BPE: argmax candidates ride a total (cnt, a, b) order, so
    // the learned schedule must not see partitioning at all
    assert(rows(graft.ext.Bpe.mergeTable(docs, 6)) ==
      rows(graft.ext.Bpe.mergeTable(skewed, 6)))
    assert(rows(graft.ext.Bpe.encodeCorpus(docs, 6)) ==
      rows(graft.ext.Bpe.encodeCorpus(skewed, 6)))
    val emb = Tables.embeddings(spark, sf)
    val evalSide = emb.filter(col("vec_id") < 10)
    val corpusSide = emb.filter(col("vec_id") >= 10)
    assert(rows(graft.ext.Similarity.crossCosinePairs(corpusSide, evalSide, 0.3)) ==
      rows(graft.ext.Similarity.crossCosinePairs(
        corpusSide.repartition(5), evalSide.repartition(3), 0.3)))
  }

  test("round-7 operators are invariant under input repartitioning") {
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq
    val emb = Tables.embeddings(spark, sf)
    // snapped k-means: integer sums are order-independent and the argmin
    // is per-row, so neither centroids nor assignments may see the split
    assert(rows(graft.ext.Ivf.kmeansAssignSnapped(emb, 8, iters = 3)) ==
      rows(graft.ext.Ivf.kmeansAssignSnapped(emb.repartition(5), 8, iters = 3)))
    assert(rows(graft.ext.TrainingPipeline.diversityCap(emb, 8, 7, iters = 3)) ==
      rows(graft.ext.TrainingPipeline.diversityCap(emb.repartition(5), 8, 7, iters = 3)))
    // fit/encode split: the frozen model must encode identically however
    // the NEW batch is partitioned (and however the fit corpus was)
    val derived = docs.withColumn("text",
      concat(col("text"), lit(" "), translate(col("text"), "aeiou", "eioua")))
    val m1 = graft.ext.Bpe.fit(docs, 6)
    val m2 = graft.ext.Bpe.fit(docs.repartition(7, col("lang")), 6)
    assert(rows(m1.encode(derived)) == rows(m2.encode(derived.repartition(5))))
    // scd2: run collapse is per-document; the snapshot stack's physical
    // layout must not leak into intervals
    val versions = docs.select(col("doc_id"), col("text"), lit(1L).as("version"))
      .unionByName(docs.select(col("doc_id"),
        concat(col("text"), lit(" v2")).as("text"), lit(2L).as("version")))
    assert(rows(graft.ext.Incremental.scdHistory(versions)) ==
      rows(graft.ext.Incremental.scdHistory(versions.repartition(9))))
  }

  test("salted word count == plain word count") {
    val docs = Tables.documents(spark, sf)
    val plain = WordCount.wordCount(docs).as[(String, Long)].collect().toSeq
    val salted = WordCount.wordCountSalted(docs, 16).as[(String, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("clusteredSorted: each partition is sorted and word-clustered") {
    val parts = WordCount.clusteredSorted(Tables.documents(spark, sf))
      .mapPartitions { it =>
        val rows = it.map(r => (r.getString(0), r.getString(1))).toSeq
        Iterator.single((rows == rows.sorted, rows.map(_._1).distinct))
      }.collect()
    assert(parts.forall(_._1), "a partition was not sorted")
    // clustering: no word appears in two partitions
    val allWords = parts.flatMap(_._2)
    assert(allWords.length == allWords.distinct.length, "word split across partitions")
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.explainString(ExplainMode.fromString("simple"))
      // the join itself must not re-shuffle either bucketed side
      val joinPart = plan.substring(plan.indexOf("Join"))
      assert(!joinPart.contains("Exchange hashpartitioning(o_custkey") &&
        !joinPart.contains("Exchange hashpartitioning(c_custkey"), plan)
      // and it must agree with the unbucketed join
      val expect = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(j.as[(String, Long)].collect().toMap == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
