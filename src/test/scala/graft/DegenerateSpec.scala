package graft

import graft.apps.{InvertedIndex, WordCount}
import graft.ext.{Dedup, Similarity, TextStats, TrainingPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Degenerate inputs must degrade to empty/sane results, never throw:
  * empty tables, null text, single-document corpora. */
class DegenerateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val empty: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType))))

  private lazy val withNull = Seq(
    (1L, "real text here for the test", "en", "s"),
    (2L, null.asInstanceOf[String], "en", "s")
  ).toDF("doc_id", "text", "lang", "source")

  test("empty corpus: wc, ii, dedup, clustering all yield empty") {
    assert(WordCount.wordCount(empty).count() == 0)
    assert(InvertedIndex.flat(empty).count() == 0)
    assert(Dedup.exactKeepIds(empty).count() == 0)
    assert(Dedup.minhashFlat(empty).count() == 0)
    assert(Dedup.nearDupClusters(empty).count() == 0)
    assert(Dedup.ngramJaccardPairs(empty).count() == 0)
    assert(TextStats.tfIdfTopK(empty).count() == 0)
  }

  test("empty corpus: round-10 ops (temperature, pack_tokens, pii scrub, hybrid, extend) degrade sanely") {
    assert(TrainingPipeline.temperatureMixture(empty, 50).count() == 0)
    assert(TrainingPipeline.packedBatches(empty).count() == 0)
    assert(TextStats.scrubPii(empty).count() == 0)
    val emptyEmb: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(graft.ext.Retrieval.hybridTopK(empty, emptyEmb, Seq("x"), 0L).count() == 0)
    // empty history + empty changes: extendHistory returns an empty frame
    val emptyHist = graft.ext.Incremental.scdHistoryHashed(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("version", LongType), StructField("text", StringType)))))
    val emptyChanges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("seq", LongType),
        StructField("op", StringType), StructField("text", StringType))))
    assert(graft.ext.Incremental.extendHistory(emptyHist, emptyChanges, 1L).count() == 0)
  }

  test("empty corpus: round-11 ops degrade sanely") {
    import org.apache.spark.sql.functions.col
    // evaluation family on an empty scored frame
    val emptyScored = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("score_scaled", LongType), StructField("is_pos", BooleanType))))
    assert(graft.ext.Eval.rocTable(emptyScored).count() == 0)
    val auc = graft.ext.Eval.aucReport(emptyScored)
      .select("n_pos", "n_neg").as[(Option[Long], Option[Long])].head()
    assert(auc == ((None, None)), "empty sweep: null counts, never a crash")
    assert(graft.ext.Eval.liftTable(emptyScored).count() == 0)
    // text/pipeline additions
    assert(graft.ext.LmScore.kneserNeyScoreDocuments(empty).count() == 0)
    assert(TrainingPipeline.cleanCorpusAudit(empty).count() == 0)
    assert(TrainingPipeline.evalContamination(empty, empty).count() == 0)
    assert(TrainingPipeline.weightedSamplePerGroup(
      empty.withColumn("n_chars", org.apache.spark.sql.functions.lit(0L)), 3).count() == 0)
    assert(TextStats.oovReport(empty).count() == 0)
    assert(TextStats.readability(empty).count() == 0)
    assert(TextStats.languageMix(empty).count() == 0)
    assert(TextStats.ngramNovelty(empty).count() == 0)
    assert(graft.ext.Entity.goldenRecords(empty).count() == 0)
    assert(graft.ext.Graph.labelPropagation(
      Seq.empty[(String, String, Long)].toDF("src", "dst", "w"), 3).count() == 0)
    // LSH quality on an empty corpus: one all-null accounting row
    // (sum over zero rows is null — the caller sees "nothing graded",
    // never a fabricated zero), and no exception anywhere in the chain
    val q = Dedup.lshQualityReport(empty)
      .select("n_true", "n_cand", "n_hit")
      .as[(Option[Long], Option[Long], Option[Long])].head()
    assert(q == ((None, None, None)))
    // similarity additions on an empty embedding table
    val emptyEmb: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.hammingTopK(emptyEmb, Seq(0L), 3, 3).count() == 0)
    assert(Similarity.hardNegatives(emptyEmb, Seq(0L), 3).count() == 0)
    assert(Similarity.dimDrift(emptyEmb).count() == 0)
  }

  test("empty corpus: round-12 ops degrade sanely") {
    import org.apache.spark.sql.functions.col
    val emptyVals = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("value", LongType),
        StructField("g", StringType))))
    // quantile sketch family: zero rows -> zero graded rows, no crash
    assert(graft.ext.Sketches
      .quantileSketch(emptyVals, "value", col("id")).count() == 0)
    assert(graft.ext.Sketches
      .quantileSketchGrouped(emptyVals, "g", "value", col("id")).count() == 0)
    // single row: every quantile lands on it, rank error 0
    val one = Seq((1L, 42L, "g")).toDF("id", "value", "g")
    val r = graft.ext.Sketches.quantileSketch(one, "value", col("id"), Seq(50))
      .select("est_value", "est_rank", "rank_err").as[(Long, Long, Long)].head()
    assert(r == ((42L, 1L, 0L)))
    // JPEG decode of empty/garbage payloads: None, and the extraction
    // degrades to the graded unknown row
    assert(graft.ext.Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(graft.ext.Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    val garbage = Seq((7L, "image", Array[Byte](0, 1, 2, 3), "s"))
      .toDF("media_id", "kind", "payload", "source")
    val jp = graft.ext.Multimodal.extractJpegPixels(garbage).head()
    assert(jp.chroma == "unknown" && jp.width == -1L && jp.mean_r == -1L)
    // 1x1 image: single MCU, both subsamplings, exact
    for (sub <- Seq(false, true)) {
      val d = graft.ext.Jpeg.decode(
        graft.ext.Jpeg.encode(1, 1, (_, _) => 0x80FF20, sub)).get
      assert(d.width == 1 && d.height == 1)
      val (y, cb, cr) = graft.ext.Jpeg.rgbToYcc(0x80, 0xFF, 0x20)
      val (er, eg, eb) = graft.ext.Jpeg.yccToRgb(y, cb, cr)
      assert(d.rgb(0) == ((er << 16) | (eg << 8) | eb))
    }
  }

  test("empty/tiny inputs: late round-12 ops (theta, kappa, calibration, codecs) degrade sanely") {
    import org.apache.spark.sql.functions.{col, lit}
    val emptyKeys = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("g", StringType), StructField("k", LongType))))
    // theta sketch: empty input -> zero graded rows; empty side in set ops
    assert(graft.ext.Sketches.thetaSketch(emptyKeys, "g", "k").count() == 0)
    assert(graft.ext.Sketches.thetaMerged(
      emptyKeys.withColumn("sub", lit("s")), "g", "sub", "k").count() == 0)
    val oneKey = Seq(("g", 5L)).toDF("g", "k")
    val ops = graft.ext.Sketches.thetaOps(oneKey, "k",
      col("k") > 100L, col("k") > 0L).collect().head
    assert(ops.getLong(ops.fieldIndex("n_a_below")) == 0L)
    assert(ops.getLong(ops.fieldIndex("n_inter")) == 0L)
    assert(ops.getLong(ops.fieldIndex("n_inter_exact")) == 0L)
    // single distinct key: sketch is the set, estimate exact
    val single = graft.ext.Sketches.thetaSketch(oneKey, "g", "k").collect().head
    assert(single.getLong(single.fieldIndex("n_kept")) == 1L)
    assert(single.getLong(single.fieldIndex("est_scaled")) == 100L)
    // kappa on an empty prediction frame: one row, zero denominators
    val emptyPred = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("pred", StringType), StructField("actual", StringType))))
    val kp = graft.ext.Eval.kappaReport(emptyPred).collect().head
    assert(kp.getLong(kp.fieldIndex("n")) == 0L)
    assert(kp.getString(kp.fieldIndex("kappa_den")).toLong == 0L)
    // codec walkers on garbage: sentinel rows, never exceptions
    assert(graft.ext.Gif.decodeFeatures(1L, Array[Byte](9, 9)).width == -1L)
    assert(graft.ext.Mp4.features(1L, Array[Byte](9, 9)).width == -1L)
    // WARC of an empty corpus: zero records land, reader yields empty
    assert(graft.sources.Warc.parseRecords(Array.emptyByteArray).isEmpty)
    // 1x1 progressive image decodes exactly like its baseline twin
    val pb = graft.ext.Jpeg.decode(graft.ext.Jpeg.encode(1, 1, (_, _) => 0x336699, subsample420 = false)).get
    val pp = graft.ext.Jpeg.decode(graft.ext.Jpeg.encodeProgressive(1, 1, (_, _) => 0x336699, subsample420 = false)).get
    assert(pp.rgb.toSeq == pb.rgb.toSeq)
  }

  test("null text rows are dropped, not fatal") {
    // tokenization drops the null row; per-doc stats carry null metrics
    assert(WordCount.wordCount(withNull).agg(
      org.apache.spark.sql.functions.sum("cnt")).as[Long].head() == 6)
    val stats = TextStats.tokenStats(withNull).collect()
    assert(stats.length == 2)
    assert(TrainingPipeline.cleanCorpus(withNull, minTokens = 1).count() == 1)
  }

  test("single-document corpus: no pairs, one cluster, valid stats") {
    val one = Seq((7L, "a b c d e f g h i j k l", "en", "s")).toDF("doc_id", "text", "lang", "source")
    assert(Dedup.ngramJaccardPairs(one).count() == 0)
    assert(Dedup.simhashPairs(one).count() == 0)
    val cl = Dedup.nearDupClusters(one).as[(Long, Long)].collect()
    assert(cl.toSeq == Seq((7L, 7L)))
  }

  test("empty payload: frame sampling yields no frames, decode still runs") {
    val docs = Seq((1L, "", "s"), (2L, "abc", "s")).toDF("doc_id", "text", "source")
    val media = graft.ext.Multimodal.asMediaTable(docs)
    val frames = graft.ext.Multimodal.sampleFrames(media)
      .as[(Long, Long)].collect().toSeq
    assert(frames == Seq((2L, 0L)))
    val feats = graft.ext.Multimodal.extractFeatures(media)
      .collect().map(f => f.media_id -> f.format).toMap
    assert(feats(1L) == "unknown") // empty payload degrades, never throws
    assert(feats(2L) == "unknown") // text bytes are not an image format
  }

  test("empty corpus: scrub, splits, stratified, tfidf pairs all yield empty") {
    assert(TextStats.scrub(empty).count() == 0)
    assert(TextStats.tfIdfCosinePairs(empty, 10).count() == 0)
    assert(TrainingPipeline.assignSplits(empty).count() == 0)
    assert(TrainingPipeline.sampleByHash(empty, 10).count() == 0)
    assert(TrainingPipeline.stratifiedSample(empty, "lang", 5).count() == 0)
    assert(graft.ext.Ivf.ivfTopK(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))))), Seq(1L), 5).count() == 0)
  }

  test("empty corpus: heavy hitters, containment, domain cap all yield empty") {
    assert(TextStats.heavyHitters(empty).count() == 0)
    assert(Dedup.containmentPairs(empty).count() == 0)
    assert(TrainingPipeline.domainCap(
      empty.withColumn("n_chars", org.apache.spark.sql.functions.lit(0L)), 5).count() == 0)
    val emptyOrders = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("o_orderkey", LongType),
        StructField("o_orderpriority", StringType),
        StructField("o_totalprice", DoubleType))))
    assert(graft.rel.Relational.priceOutliers(emptyOrders).count() == 0)
  }

  test("round-8 ops degrade sanely on empty and degenerate inputs") {
    import org.apache.spark.sql.functions._
    // prefix-filtered jaccard: empty corpus, and a single doc (no pairs)
    assert(Dedup.prefixJaccardPairs(empty, 0.5).count() == 0)
    val one = Seq((1L, "just one document here")).toDF("doc_id", "text")
    assert(Dedup.prefixJaccardPairs(one, 0.5).count() == 0)
    // pmi: empty corpus and a one-token corpus (no bigrams) yield empty
    assert(TextStats.pmiCollocations(empty, 10, 1).count() == 0)
    assert(TextStats.pmiCollocations(Seq((1L, "word")).toDF("doc_id", "text"), 10, 1)
      .count() == 0)
    // preference pairs: empty corpus, and an all-empty-text corpus
    // (every doc excluded by the zero-token guard)
    assert(TrainingPipeline.preferencePairs(empty).count() == 0)
    val blank = Seq((1L, "", "en", "s"), (2L, "", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(TrainingPipeline.preferencePairs(blank).count() == 0)
    // triangles: empty edges, and a pure path graph (no triangles)
    val noEdges = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(graft.ext.Graph.triangleCounts(noEdges).count() == 0)
    val path = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L))
      .toDF("src", "dst", "w")
    assert(graft.ext.Graph.triangleCounts(path).count() == 0)
    // cdc apply: empty base + inserts-only log builds the table from scratch
    val emptyBase = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val log = Seq((1L, 1L, "upsert", "t", "s"),
      (2L, 1L, "delete", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("doc_id", "seq", "op", "text", "source")
    val built = graft.ext.Incremental.applyChanges(emptyBase, log, Seq("text", "source"))
      .as[(Long, String, String)].collect().toSeq
    assert(built == Seq((1L, "t", "s")), "delete of an absent id is a no-op")
  }

  test("constant group: zero variance never divides by zero in outliers") {
    val orders = Seq((1L, "P", 5.0), (2L, "P", 5.0), (3L, "P", 5.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    assert(graft.rel.Relational.priceOutliers(orders).count() == 0)
  }

  test("zero-norm embeddings are excluded from pair mining, not NaN-poisoned") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)), // no direction
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 1e-6f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.topCosinePairs(emb, 2).as[(Long, Long, Double)].collect()
    val exact = Similarity.topCosinePairsExact(emb, 2).as[(Long, Long, Double)].collect()
    assert(top.toSeq == exact.toSeq)
    assert(top.head._1 == 1L && top.head._2 == 2L, top.mkString(";"))
    assert(!top.exists(p => p._3.isNaN))
  }

  test("empty embeddings: topk and pairs yield empty") {
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.bruteForceTopK(emptyEmb, Seq(1L), 5).count() == 0)
    assert(Similarity.topCosinePairs(emptyEmb, 10).count() == 0)
    assert(Similarity.lshTopK(emptyEmb, Seq(1L), 5).count() == 0)
    assert(Similarity.quantizeInt8(emptyEmb).count() == 0)
    assert(Similarity.lshCandidates(emptyEmb, Seq(1L)).count() == 0)
    assert(graft.ext.Ivf.kmeansAssignSnapped(emptyEmb, 8).count() == 0)
    assert(graft.ext.TrainingPipeline.diversityCap(emptyEmb, 8, 3).count() == 0)
  }

  test("all-empty embedding arrays: exact-bound guard fails loudly, not with an NPE") {
    // dim-0 vectors make max(size)=0 non-null while array_min/max are
    // null; the guard must raise its documented requirement, not throw a
    // bare NullPointerException from getDouble on a null field
    val dimZero = Seq((1L, Array.empty[Float]), (2L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Ivf.kmeansAssignSnapped(dimZero, 2, iters = 1).collect()
    }
    assert(e.getMessage.contains("every embedding array is empty"))
  }

  test("scd2 history: empty snapshot stack yields empty, single version is one current run") {
    val emptyV = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("version", LongType), StructField("text", StringType))))
    assert(graft.ext.Incremental.scdHistory(emptyV).count() == 0)
    val one = Seq((7L, 1L, "x")).toDF("doc_id", "version", "text")
    assert(graft.ext.Incremental.scdHistory(one)
      .as[(Long, Long, Long, Boolean)].collect().toSeq == Seq((7L, 1L, 1L, true)))
  }

  test("snapped kmeans with fewer vectors than cells: full coverage, cap beyond size keeps all") {
    val emb = Seq((10L, Array(1.0f, 0.0f)), (20L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // nlist=8 but only 2 vectors: every vector still gets a cell and the
    // size accounting stays consistent
    val a = graft.ext.Ivf.kmeansAssignSnapped(emb, 8, iters = 2)
      .as[(Long, Int, Long)].collect().toSeq
    assert(a.map(_._1).sorted == Seq(10L, 20L))
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    // capPerCell larger than any cell: nothing dropped, ranks start at 1
    val d = graft.ext.TrainingPipeline.diversityCap(emb, 8, capPerCell = 5, iters = 2)
      .as[(Long, Int, Long)].collect().toSeq
    assert(d.map(_._1).sorted == Seq(10L, 20L))
    assert(d.forall(_._3 == 1L) || d.map(_._3).sorted == Seq(1L, 2L))
  }

  test("semantic decontamination degrades sanely on empty sides") {
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // empty eval set: nothing flagged, everything kept
    assert(Similarity.crossCosinePairs(emb, emptyEmb, 0.5).count() == 0)
    assert(Similarity.semanticDecontaminate(emb, emptyEmb, 0.5).count() == 2)
    // empty corpus: nothing to flag or keep
    assert(Similarity.crossCosinePairs(emptyEmb, emb, 0.5).count() == 0)
    assert(Similarity.semanticDecontaminate(emptyEmb, emb, 0.5).count() == 0)
    // both empty: right shape, zero rows
    val both = Similarity.crossCosinePairs(emptyEmb, emptyEmb, 0.5)
    assert(both.columns.toSeq == Seq("corpus_id", "eval_id", "score") && both.count() == 0)
  }

  test("empty corpus: classifier, graph, sampling, budget, retrieval all degrade sanely") {
    assert(graft.ext.Classify.naiveBayesPredict(empty).count() == 0)
    assert(graft.ext.Graph.wordPageRank(empty).count() == 0)
    assert(graft.ext.Graph.degreeStats(
      Seq.empty[(String, String, Long)].toDF("src", "dst", "w")).count() == 0)
    assert(TrainingPipeline.weightedSample(empty, 5, weightCol = "doc_id").count() == 0)
    assert(TrainingPipeline.tokenBudget(empty, 100).count() == 0)
    assert(TextStats.bm25(empty, Seq("x"), 5).count() == 0)
    // single-token docs: a bigram graph cannot form; PageRank stays empty
    val oneTok = Seq((1L, "word"), (2L, "another")).toDF("doc_id", "text")
    assert(graft.ext.Graph.wordPageRank(oneTok).count() == 0)
  }
}
