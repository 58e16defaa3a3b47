package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev-only profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("docs")(docs.count())
    time("tokenize")(graft.text.Tokenize.tokenize(docs).count())
    time("shingleRows")(Dedup.shingleRows(docs).count())
    time("shingleRows+poly")(Dedup.shingleRows(docs)
      .select(Dedup.polyHash(col("shingle")).as("bh")).filter(col("bh") > 0).count())
    time("minhashFlat poly 8")(Dedup.minhashFlat(docs, 3, 8, Dedup.polyHash).count())
    time("minhashFlat xx 8")(Dedup.minhashFlat(docs, 3, 8).count())
    time("minhashSig xx 64")(Dedup.minhashSignature(docs, 3, 64).count())
    time("lshBandStats poly")(Dedup.lshBandStats(docs, 3, 8, 4, Dedup.polyHash).count())
    time("ngramJaccard")(Dedup.ngramJaccardPairs(docs, 3).count())
    time("minhashCandidates")(Dedup.minhashCandidates(docs).count())
    time("neardups")(Dedup.minhashNearDuplicates(docs, 0.3).count())
    // 10x self-union with offset ids: 50k docs, every doc duplicated 10x —
    // a true near-dup stress (LSH buckets of 10, 45 pairs each)
    val docs10 = (0 until 10).map(i => docs.select(
      (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"))).reduce(_ unionByName _)
    time("10x wc")(graft.apps.WordCount.wordCount(
      docs10.withColumn("source", col("doc_id").cast("string"))).count())
    time("10x minhashCandidates")(Dedup.minhashCandidates(docs10).count())
    time("10x neardups>=0.9")(Dedup.minhashNearDuplicates(docs10, 0.9).count())
    time("10x simhashPairs")(Dedup.simhashPairs(docs10, 30, 3).count())
    time("10x exact dedup")(Dedup.exactKeepIds(docs10).count())
    time("10x ngram maxDf=200")(Dedup.ngramJaccardPairs(docs10, 3, maxDf = 200).count())
    // apples-to-apples vs BASELINE.md: the reference's exact workload size
    locally {
      val line = """^(\S*) - \[?(\d+)\]?$""".r
      val golden = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/final_wc.txt")),
        java.nio.charset.StandardCharsets.ISO_8859_1)
        .linesIterator.filter(_.nonEmpty).collect { case line(w, n) => (w, n.toInt) }.toSeq
      val toks = golden.flatMap { case (w, n) => Seq.fill(n)(w) }
      import spark.implicits._
      val corpus = toks.grouped(600).zipWithIndex
        .map { case (t, i) => (t.mkString(" "), s"d$i") }.toSeq.toDF("text", "source")
      corpus.count() // materialize input
      time("baseline-scale wc (28.6k tokens)")(
        graft.apps.WordCount.wordCount(corpus).count())
    }
    time("clusters sf0.1")(Dedup.nearDupClusters(docs, 0.3).count())
    time("range_join again")(graft.rel.TemporalJoins.eventPairsWithin(
      Tables.events(spark, "/root/testdata/sf0.1")).count())
    val media = graft.ext.Multimodal.asMediaTable(docs)
    time("mm media")(media.count())
    time("mm features")(graft.ext.Multimodal.extractFeatures(media).count())
    time("mm featuresQuery")(graft.ext.Multimodal.featuresQuery(spark, docs).count())
    spark.stop()
  }
}
