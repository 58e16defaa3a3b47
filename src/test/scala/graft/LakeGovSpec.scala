package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Table governance through the commit log: CHECK constraints (SQL
  * CHECK semantics — FALSE violates, NULL passes; enforcement aborts
  * BEFORE staging) and the reader/writer protocol gate (a table
  * requiring features this engine lacks is refused loudly instead of
  * silently misread). */
class LakeGovSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lgov_${name}_${System.nanoTime()}"

  private def mkDocs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"text $i", "en", s"src${i % 3}", (10 + i).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("a violating append aborts before staging: no new version, no new files") {
    val t = freshDir("abort")
    LakeTxn.appendCommit(spark, mkDocs(0 until 20).repartition(1), t)
    LakeTxn.addConstraint(spark, t, "pos_chars", "n_chars >= 0")
    val vBefore = LakeTxn.listVersions(spark, t).size
    val dataBefore = java.nio.file.Files.list(
      java.nio.file.Paths.get(t, "data")).count()
    intercept[LakeTxn.ConstraintViolationException](
      LakeTxn.appendCommit(spark,
        mkDocs(20 until 30).withColumn("n_chars", lit(-5L)), t))
    assert(LakeTxn.listVersions(spark, t).size === vBefore)
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(t, "data")).count() === dataBefore,
      "a violating batch must leave no staged files behind")
    assert(LakeTxn.read(spark, t).count() === 20L)
  }

  test("addConstraint validates EXISTING data; NULL passes (SQL CHECK semantics)") {
    val t = freshDir("existing")
    LakeTxn.appendCommit(spark,
      mkDocs(0 until 10).withColumn("n_chars",
        when(col("doc_id") === 3, lit(null).cast("long"))
          .otherwise(col("n_chars"))).repartition(1), t)
    // a constraint the existing data violates is refused
    intercept[LakeTxn.ConstraintViolationException](
      LakeTxn.addConstraint(spark, t, "big", "n_chars >= 100"))
    // NULL n_chars PASSES a n_chars-comparison constraint (CHECK is
    // violated only when FALSE)
    LakeTxn.addConstraint(spark, t, "pos", "n_chars >= 0")
    LakeTxn.appendCommit(spark,
      mkDocs(10 until 15).withColumn("n_chars", lit(null).cast("long"))
        .repartition(1), t)
    assert(LakeTxn.read(spark, t).count() === 15L)
  }

  test("dropConstraint re-allows; constraints survive a checkpoint") {
    val t = freshDir("drop")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    LakeTxn.addConstraint(spark, t, "pos", "n_chars >= 0")
    LakeTxn.checkpointLog(spark, t)
    LakeTxn.appendCommit(spark, mkDocs(10 until 20).repartition(1), t)
    // folded FROM the checkpoint, the constraint still bites
    assert(LakeTxn.snapshot(spark, t).constraints.keySet === Set("pos"))
    intercept[LakeTxn.ConstraintViolationException](
      LakeTxn.appendCommit(spark,
        mkDocs(20 until 25).withColumn("n_chars", lit(-1L)), t))
    LakeTxn.dropConstraint(spark, t, "pos")
    LakeTxn.appendCommit(spark,
      mkDocs(20 until 25).withColumn("n_chars", lit(-1L)).repartition(1), t)
    assert(LakeTxn.read(spark, t).count() === 25L)
  }

  test("dropConstraint validates the name (no JSON injection into the log)") {
    val t = freshDir("dropinj")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    LakeTxn.addConstraint(spark, t, "pos", "n_chars >= 0")
    assertThrows[IllegalArgumentException](
      LakeTxn.dropConstraint(spark, t, """x","evil":"y"""))
    assert(LakeTxn.snapshot(spark, t).constraints.keySet === Set("pos"))
  }

  test("reader protocol gate: too-new tables are refused at snapshot; time travel below the upgrade still reads") {
    val t = freshDir("rproto")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    val v = LakeTxn.setProtocol(spark, t, reader = 99, writer = 1)
    val e = intercept[IllegalArgumentException](LakeTxn.read(spark, t))
    assert(e.getMessage.contains("reader protocol version 99"))
    // the pre-upgrade version is governed by the OLD protocol
    assert(LakeTxn.read(spark, t, asOf = Some(v - 1)).count() === 10L)
  }

  test("writer protocol gate: too-new tables refuse commits; downgrades are refused") {
    val t = freshDir("wproto")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    intercept[IllegalArgumentException](
      LakeTxn.setProtocol(spark, t, reader = 0, writer = 0))
    LakeTxn.setProtocol(spark, t, reader = 1, writer = 99)
    val e = intercept[IllegalArgumentException](
      LakeTxn.appendCommit(spark, mkDocs(10 until 20).repartition(1), t))
    assert(e.getMessage.contains("writer protocol version 99"))
    // reads still work: only the writer gate was raised
    assert(LakeTxn.read(spark, t).count() === 10L)
  }

  test("vacuum reclaims crashed staging directories past the grace window") {
    val t = freshDir("stagedir")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    val crashed = java.nio.file.Paths.get(t, ".stage-deadbeef")
    java.nio.file.Files.createDirectories(crashed)
    java.nio.file.Files.writeString(crashed.resolve("part-0"), "junk")
    // fresh: inside the grace window, a live writer may own it
    LakeTxn.vacuum(spark, t, retainLast = 1)
    assert(java.nio.file.Files.exists(crashed))
    // past the grace window it is a leak — reclaimed recursively
    LakeTxn.vacuum(spark, t, retainLast = 1, orphanGraceMs = 0L)
    assert(!java.nio.file.Files.exists(crashed))
    assert(LakeTxn.read(spark, t).count() === 10L)
  }

  test("protocol survives a checkpoint") {
    val t = freshDir("ckproto")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    LakeTxn.setProtocol(spark, t, reader = 1, writer = 99)
    // checkpointing a writer-fenced table is a READ-side operation
    LakeTxn.checkpointLog(spark, t)
    val e = intercept[IllegalArgumentException](
      LakeTxn.appendCommit(spark, mkDocs(10 until 20).repartition(1), t))
    assert(e.getMessage.contains("writer protocol version 99"))
  }
}
