package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.ext.LakeTxn
import graft.sources.LakeOffset

/** The lake-tailing DataSource V2 stream: offsets are log versions,
  * a micro-batch plans exactly the files its commit range added,
  * restarts resume from the checkpointed version, non-append commits
  * fail loudly (or skip under ignoreDeletes), schema evolution
  * null-fills, and vacuumed history is refused at PLAN time. */
class LakeStreamSourceSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lssspec_${name}_${System.nanoTime()}"

  private def mkDocs(ids: Range, lang: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"text $i", lang, s"src${i % 3}", (10 + i).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private var memN = 0
  private def runAvailableNow(t: String, ckpt: String,
                              options: Map[String, String] = Map.empty,
                              schema: Option[org.apache.spark.sql.types.StructType] = None)
      : (DataFrame, Int) = {
    memN += 1
    val mem = s"lss_${System.nanoTime()}_$memN"
    var r = spark.readStream.format("graft-lake")
    options.foreach { case (k, v) => r = r.option(k, v) }
    schema.foreach(st => r = r.schema(st))
    val q = r.load(t)
      .writeStream.outputMode("append")
      .format("memory").queryName(mem)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    (spark.table(mem), batches)
  }

  test("offset json round-trips") {
    assert(LakeOffset.fromJson(LakeOffset(17L).json()) === LakeOffset(17L))
    assert(LakeOffset.fromJson("""{"version":-1}""") === LakeOffset(-1L))
    assertThrows[IllegalArgumentException](LakeOffset.fromJson("""{"v":3}"""))
  }

  test("one commit per micro-batch; a restart resumes from the recorded version") {
    val t = freshDir("tail")
    val ckpt = s"$t/_ckpt"
    val out = s"$t/_out"
    LakeTxn.appendCommit(spark, mkDocs(0 until 30, "en").repartition(2), t)
    LakeTxn.appendCommit(spark, mkDocs(30 until 50, "fr").repartition(2), t)
    LakeTxn.appendCommit(spark, mkDocs(50 until 55, "de").repartition(1), t)

    // a recoverable file sink: the memory sink cannot resume a
    // checkpoint in append mode
    def pass(): Int = {
      val q = spark.readStream.format("graft-lake")
        .option("maxVersionsPerBatch", "1").load(t)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.count(_.numInputRows > 0)
    }
    assert(pass() === 3, "admission control must split the three commits")
    assert(spark.read.parquet(out).count() === 55L)

    // stream stopped; a fourth commit lands; the SAME checkpoint resumes
    LakeTxn.appendCommit(spark, mkDocs(55 until 70, "pt").repartition(2), t)
    pass()
    val all = spark.read.parquet(out)
    // a restart that re-read history would exceed 70; one that lost the
    // offset would miss the new commit
    assert(all.count() === 70L)
    assert(all.filter(col("doc_id") >= 55).count() === 15L)
  }

  test("delivered rows are exactly the committed union (content, not just counts)") {
    val t = freshDir("content")
    val a = mkDocs(0 until 25, "en")
    val b = mkDocs(25 until 40, "fr")
    LakeTxn.appendCommit(spark, a.repartition(3), t)
    LakeTxn.appendCommit(spark, b.repartition(2), t)
    val (got, _) = runAvailableNow(t, s"$t/_ckpt")
    val want = a.unionByName(b).orderBy("doc_id").collect().map(_.mkString("|"))
    assert(got.orderBy("doc_id").collect().map(_.mkString("|")) === want)
  }

  test("a rewrite commit (compaction) always fails loudly") {
    val t = freshDir("rewrite")
    LakeTxn.appendCommit(spark, mkDocs(0 until 20, "en").repartition(2), t)
    LakeTxn.appendCommit(spark, mkDocs(20 until 40, "fr").repartition(2), t)
    LakeTxn.compactCommit(spark, t, Long.MaxValue / 4)
    val e = intercept[StreamingQueryException](
      runAvailableNow(t, s"$t/_ckpt", Map("ignoreDeletes" -> "true")))
    assert(e.getMessage.contains("REWRITE"))
  }

  test("a delete commit fails by default; ignoreDeletes skips the tombstones") {
    val t = freshDir("del")
    LakeTxn.appendCommit(spark, mkDocs(0 until 20, "en").repartition(2), t)
    LakeTxn.deleteWhereMor(spark, t, col("doc_id") % 5 === 0)
    val e = intercept[StreamingQueryException](runAvailableNow(t, s"$t/_ckpt1"))
    assert(e.getMessage.contains("ignoreDeletes"))
    // with the option: already-delivered rows stay delivered (Delta contract)
    val (got, _) = runAvailableNow(t, s"$t/_ckpt2", Map("ignoreDeletes" -> "true"))
    assert(got.count() === 20L)
  }

  test("schema evolution: pre-evolution files null-fill; a pinned narrow schema projects") {
    val t = freshDir("evolve")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10, "en").repartition(1), t)
    LakeTxn.appendCommitEvolve(spark,
      mkDocs(10 until 18, "fr").withColumn("quality", col("doc_id") % 3), t)
    // inferred schema now carries `quality`; old files read it as NULL
    val (got, _) = runAvailableNow(t, s"$t/_ckpt")
    assert(got.columns.contains("quality"))
    assert(got.filter(col("doc_id") < 10 && col("quality").isNull).count() === 10L)
    assert(got.filter(col("doc_id") >= 10 && col("quality").isNotNull).count() === 8L)
    // a user-pinned narrow schema projects the wide files down — the
    // executor reader fetches only those columns' chunks
    val narrow = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))
    val (thin, _) = runAvailableNow(t, s"$t/_ckpt_narrow", schema = Some(narrow))
    assert(thin.columns.toSeq === Seq("doc_id", "lang"))
    assert(thin.count() === 18L)
  }

  test("a partitioned table streams with the partition column INJECTED, not null-filled") {
    val t = freshDir("part")
    import spark.implicits._
    val d = (0 until 30).map(i =>
      (i.toLong, s"text $i", if (i % 2 == 0) "en" else "fr", s"src${i % 3}", (10 + i).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    LakeTxn.appendCommitPartitioned(spark, d, t, "lang")
    val (got, _) = runAvailableNow(t, s"$t/_ckpt")
    assert(got.columns.contains("lang"))
    assert(got.filter(col("lang").isNull).count() === 0L,
      "a null-filled partition column is silent corruption")
    assert(got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("en" -> 15L, "fr" -> 15L))
    // content exactness incl. the reconstructed column
    val want = d.orderBy("doc_id").select("doc_id", "lang").collect().map(_.mkString("|"))
    assert(got.orderBy("doc_id").select("doc_id", "lang").collect()
      .map(_.mkString("|")) === want)
  }

  test("maxRowsPerBatch / maxFilesPerBatch admission: commits pack until the cap") {
    val t = freshDir("limits")
    for (r <- 0 until 4)
      LakeTxn.appendCommit(spark, mkDocs(r * 10 until (r + 1) * 10, "en")
        .repartition(1), t)
    // 10 rows per commit; 25-row cap packs two commits per batch
    val (_, rowBatches) = runAvailableNow(t, s"$t/_cr",
      Map("maxRowsPerBatch" -> "25"))
    assert(rowBatches === 2, s"25-row cap over 4x10 rows must give 2 batches")
    // 1 file per commit; 1-file cap gives one commit per batch
    val (all, fileBatches) = runAvailableNow(t, s"$t/_cf",
      Map("maxFilesPerBatch" -> "1"))
    assert(fileBatches === 4)
    assert(all.count() === 40L)
    // a cap SMALLER than one commit still admits that commit (at-least-one)
    val (tiny, tinyBatches) = runAvailableNow(t, s"$t/_ct",
      Map("maxRowsPerBatch" -> "3"))
    assert(tiny.count() === 40L && tinyBatches === 4)
  }

  test("lake->lake pipeline: a fresh-checkpoint full replay lands nothing twice") {
    val src = freshDir("pipesrc")
    val dst = freshDir("pipedst")
    LakeTxn.appendCommit(spark, mkDocs(0 until 20, "en").repartition(2), src)
    LakeTxn.appendCommit(spark, mkDocs(20 until 35, "de").repartition(2), src)
    def run(ckpt: String): Unit = {
      val q = spark.readStream.format("graft-lake")
        .option("maxVersionsPerBatch", 1).load(src)
        .filter(col("lang") =!= "de")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          LakeTxn.appendBatchCommit(spark, batch, dst,
            app = "pipe-spec", batchId = epochId): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run(s"$src/_c1")
    assert(LakeTxn.read(spark, dst).count() === 20L)
    // full replay from a FRESH checkpoint: every epoch re-delivers, the
    // idempotence markers skip them all
    run(s"$src/_c2")
    assert(LakeTxn.read(spark, dst).count() === 20L)
    // and new upstream data still flows through a resumed checkpoint
    LakeTxn.appendCommit(spark, mkDocs(35 until 45, "fr").repartition(1), src)
    run(s"$src/_c2")
    assert(LakeTxn.read(spark, dst).count() === 30L)
  }

  test("startingVersion skips history; vacuumed history is refused at plan time") {
    val t = freshDir("vac")
    for (r <- 0 until 4)
      LakeTxn.appendCommit(spark, mkDocs(r * 10 until (r + 1) * 10, "en").repartition(1), t)
    val (tail, _) = runAvailableNow(t, s"$t/_ckpt_sv",
      Map("startingVersion" -> "2"))
    assert(tail.count() === 20L)
    assert(tail.agg(min("doc_id")).head.getLong(0) === 20L)
    LakeTxn.vacuum(spark, t, retainLast = 1, orphanGraceMs = 0L)
    val e = intercept[StreamingQueryException](runAvailableNow(t, s"$t/_ckpt_v0"))
    assert(e.getMessage.contains("vacuum retention horizon"))
    // a stream starting at the horizon is fine
    val h = LakeTxn.vacuumHorizon(spark, t).get
    val (ok, _) = runAvailableNow(t, s"$t/_ckpt_vh",
      Map("startingVersion" -> h.toString))
    assert(ok.count() === 10L)
  }
}
