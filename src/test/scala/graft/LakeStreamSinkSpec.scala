package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ext.LakeTxn

/** The native V2 STREAMING sink (`writeStream.format("graft-lake")`):
  * one atomic marker-keyed commit per epoch, exactly-once under full
  * replay, constraints enforced mid-stream. */
class LakeStreamSinkSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lsink_${name}_${System.nanoTime()}"

  private def mkDocs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, Seq("en", "fr", "de")(i % 3), (10 + i).toLong))
      .toDF("doc_id", "lang", "n_chars")
  }

  private def drain(src: String, dst: String, ckpt: String,
                    app: String = "sinkspec"): Unit = {
    val q = spark.readStream.format("graft-lake")
      .option("maxVersionsPerBatch", 1)
      .load(src)
      .writeStream.outputMode("append")
      .format("graft-lake")
      .option("txnAppId", app)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
  }

  test("each epoch is one marker-keyed commit; full replay lands nothing twice") {
    val src = freshDir("src")
    val dst = freshDir("dst")
    val d = mkDocs(0 until 60)
    for (r <- 0 until 3)
      LakeTxn.appendCommit(spark, d.filter(col("doc_id") % 3 === r).repartition(2), src)
    LakeTxn.createTable(spark, dst, d.schema)
    drain(src, dst, s"$src/_ck1")
    assert(LakeTxn.read(spark, dst).count() === 60L)
    // one commit per epoch (3 data epochs) after the schema commit,
    // each carrying its marker
    val vs = LakeTxn.listVersions(spark, dst)
    assert(vs.size === 4, s"wanted create + 3 epochs, got $vs")
    val markers = LakeTxn.committedBatchIds(spark, dst)
    assert(markers.map(_._1) === Set("sinkspec"))
    assert(markers.map(_._2) === Set(0L, 1L, 2L))
    // the harshest replay: a FRESH checkpoint re-delivers every epoch;
    // the markers skip all of them
    drain(src, dst, s"$src/_ck2")
    assert(LakeTxn.read(spark, dst).count() === 60L)
    assert(LakeTxn.listVersions(spark, dst).size === 4)
    // new data then resumes the SAME checkpoint: only the new commit lands
    LakeTxn.appendCommit(spark, mkDocs(60 until 80).repartition(2), src)
    drain(src, dst, s"$src/_ck1")
    assert(LakeTxn.read(spark, dst).count() === 80L)
    // content is exact, not just counted
    assert(LakeTxn.read(spark, dst).orderBy("doc_id").collect().map(_.mkString("|")).toSeq
      === mkDocs(0 until 80).orderBy("doc_id").collect().map(_.mkString("|")).toSeq)
    // no stage leftovers pollute the destination
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(dst))
      .filter(s => s.getPath.getName.startsWith(".stage-v2s"))
      .flatMap(s => fs.listStatus(s.getPath))
    assert(stray.isEmpty, s"staged leftovers: ${stray.map(_.getPath).mkString(", ")}")
  }

  test("a CHECK constraint aborts the epoch mid-stream; nothing lands") {
    val src = freshDir("csrc")
    val dst = freshDir("cdst")
    val d = mkDocs(0 until 20)
    LakeTxn.appendCommit(spark, d.repartition(2), src)
    LakeTxn.createTable(spark, dst, d.schema)
    LakeTxn.addConstraint(spark, dst, "small", "n_chars < 25")
    val e = intercept[Exception](drain(src, dst, s"$src/_ck"))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[LakeTxn.ConstraintViolationException]),
      s"got $e")
    // the violating epoch left no data commit and no marker
    assert(LakeTxn.listVersions(spark, dst).size === 2) // create + constraint
    assert(LakeTxn.committedBatchIds(spark, dst).isEmpty)
  }
}
