package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** The V2 BATCH read of the lake: Catalyst-pushed filters prune the
  * file list from log metadata alone (stats bands, bloom membership,
  * partition values), proven corruption-style — skipped files are
  * garbage on disk and the read still answers exactly. */
class LakeV2BatchSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lv2b_${name}_${System.nanoTime()}"

  private def grid(): DataFrame = {
    import spark.implicits._
    (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong))
      .toDF("id", "x", "y")
  }

  private def garbage(table: String, keep: Set[String]): Int = {
    val dir = java.nio.file.Paths.get(table, "data")
    var n = 0
    java.nio.file.Files.list(dir).forEach { p =>
      if (!p.getFileName.toString.endsWith(".crc") &&
        !keep.contains(s"data/${p.getFileName}")) {
        java.nio.file.Files.write(p, Array.fill[Byte](64)(0x5A))
        n += 1
      }
    }
    n
  }

  test("pushed band filters prune from 2-D log stats; skipped files never open") {
    val t = freshDir("band")
    LakeTxn.appendCommitZorder(spark, grid(), t, "x", "y", files = 16, bits = 6)
    val df = spark.read.format("graft-lake").load(t)
      .filter(col("x").between(8, 15) && col("y").between(48, 55))
    val want = grid().filter(col("x").between(8, 15) && col("y").between(48, 55))
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(df.orderBy("id").collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSeq === want.toSeq)
    // the plan carries the pushed filters through the V2 scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-lake"), plan.take(500))
    // corrupt everything outside the box: the connector must not open it
    val snap = LakeTxn.snapshot(spark, t)
    val kept = snap.adds.filter(a =>
      a.hi >= 8 && a.lo <= 15 && a.hi2 >= 48 && a.lo2 <= 55).map(_.file).toSet
    assert(garbage(t, kept) > 0)
    // schema captured pre-corruption: planning may legitimately open one
    // footer for inference; the claim under test is the DATA path
    assert(spark.read.format("graft-lake").schema(df.schema).load(t)
      .filter(col("x").between(8, 15) && col("y").between(48, 55))
      .count() === 64L)
  }

  test("pushed equality prunes from bloom filters") {
    val t = freshDir("bloom")
    import spark.implicits._
    val docs = (0L until 600L).map(i => (i, s"text $i", (10 + i)))
      .toDF("doc_id", "text", "n_chars")
    for (r <- 0 until 3)
      LakeTxn.appendCommitBloom(spark, docs.filter(col("doc_id") % 3 === r)
        .repartition(4), t, keyCol = "doc_id")
    val sch = spark.read.format("graft-lake").load(t).schema
    val snap = LakeTxn.snapshot(spark, t)
    val kept = snap.adds.filter(a =>
      LakeTxn.bloomMightContainKey(a.bloom, 17L)).map(_.file).toSet
    assert(kept.size < snap.adds.size, "the probe must prune some file")
    assert(garbage(t, kept) > 0)
    val got = spark.read.format("graft-lake").schema(sch).load(t)
      .filter(col("doc_id") === 17L).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(17L))
  }

  test("pushed IN-lists prune from bloom filters (fresh table)") {
    val t = freshDir("bloomin")
    import spark.implicits._
    val docs = (0L until 600L).map(i => (i, s"text $i", (10 + i)))
      .toDF("doc_id", "text", "n_chars")
    LakeTxn.appendCommitBloom(spark, docs.repartition(12), t, keyCol = "doc_id")
    val sch = spark.read.format("graft-lake").load(t).schema
    val snap = LakeTxn.snapshot(spark, t)
    val keys = Seq(17L, 23L)
    val kept = snap.adds.filter(a => keys.exists(k =>
      LakeTxn.bloomMightContainKey(a.bloom, k))).map(_.file).toSet
    assert(kept.size < snap.adds.size)
    assert(garbage(t, kept) > 0)
    assert(spark.read.format("graft-lake").schema(sch).load(t)
      .filter(col("doc_id").isin(keys: _*))
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq === keys)
  }

  test("pushed partition equality prunes; the value is injected, not null") {
    val t = freshDir("pv")
    import spark.implicits._
    val d = (0 until 60).map(i =>
      (i.toLong, s"text $i", Seq("en", "fr", "de")(i % 3)))
      .toDF("doc_id", "text", "lang")
    LakeTxn.appendCommitPartitioned(spark, d, t, "lang")
    val sch = spark.read.format("graft-lake").load(t).schema
    assert(sch.fieldNames.contains("lang"),
      "inferSchema must append the log-only partition column")
    val snap = LakeTxn.snapshot(spark, t)
    val kept = snap.adds.filter(_.pvValue == "en").map(_.file).toSet
    assert(garbage(t, kept) > 0)
    val got = spark.read.format("graft-lake").schema(sch).load(t)
      .filter(col("lang") === "en")
    assert(got.count() === 20L)
    assert(got.filter(col("lang").isNull).count() === 0L)
  }

  test("versionAsOf time-travels; deletion vectors apply merge-on-read in the readers") {
    val t = freshDir("tt")
    import spark.implicits._
    val d = (0L until 40L).map(i => (i, s"t$i", 10 + i))
      .toDF("doc_id", "text", "n_chars")
    LakeTxn.appendCommit(spark, d.filter(col("doc_id") < 20).repartition(1), t)
    LakeTxn.appendCommit(spark, d.filter(col("doc_id") >= 20).repartition(1), t)
    assert(spark.read.format("graft-lake").option("versionAsOf", "0")
      .load(t).count() === 20L)
    assert(spark.read.format("graft-lake").load(t).count() === 40L)
    // tombstone a residue class across both files: the connector's
    // readers skip exactly those positions, no file rewritten
    val dvV = LakeTxn.deleteWhereMor(spark, t, col("doc_id") % 5 === 3)
    val got = spark.read.format("graft-lake").load(t)
    assert(got.count() === 32L)
    assert(got.filter(col("doc_id") % 5 === 3).count() === 0L)
    // content equality with the reference reader
    assert(got.orderBy("doc_id").collect().map(_.mkString("|")).toSeq ===
      LakeTxn.read(spark, t).orderBy("doc_id").collect().map(_.mkString("|")).toSeq)
    // stacked vector: a second delete composes
    LakeTxn.deleteWhereMor(spark, t, col("doc_id") === 0L)
    assert(spark.read.format("graft-lake").load(t).count() === 31L)
    // time travel BEFORE the first delete sees everything
    assert(spark.read.format("graft-lake")
      .option("versionAsOf", (dvV - 1).toString).load(t).count() === 40L)
    // compaction purges the vectors; the connector reads the plain pack
    LakeTxn.compactCommit(spark, t, Long.MaxValue / 4)
    assert(spark.read.format("graft-lake").load(t).count() === 31L)
  }

  test("the batch scan is COLUMNAR (vectorized) and matches the row reader exactly") {
    val t = freshDir("vec")
    import spark.implicits._
    val d = (0L until 500L).map(i =>
      (i, s"text $i", if (i % 7 == 0) null else s"src${i % 3}",
        i.toDouble / 3, i % 2 == 0))
      .toDF("doc_id", "text", "source", "score", "flag")
    LakeTxn.appendCommit(spark, d.repartition(3), t)
    val df = spark.read.format("graft-lake").load(t)
    // a DV-free atomic-schema scan must take the vectorized path: the
    // executed plan shows the ColumnarToRow transition above the scan
    df.collect(): Unit
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan.take(800))
    assert(df.orderBy("doc_id").collect().map(_.mkString("|")).toSeq ===
      LakeTxn.read(spark, t).orderBy("doc_id").collect().map(_.mkString("|")).toSeq)
    // a deletion vector KEEPS the scan columnar (merge-on-read masking
    // compacts each decoded batch) — and content still matches the
    // reference reader's anti-join exactly
    LakeTxn.deleteWhereMor(spark, t, col("doc_id") % 5 === 3)
    val dv = spark.read.format("graft-lake").load(t)
    dv.collect(): Unit
    assert(dv.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a DV'd scan must stay on the vectorized reader (masked batches)")
    assert(dv.count() === 400L)
    assert(dv.orderBy("doc_id").collect().map(_.mkString("|")).toSeq ===
      LakeTxn.read(spark, t).orderBy("doc_id").collect().map(_.mkString("|")).toSeq)
  }

  test("columnar scan injects partition values and null-fills evolved columns") {
    val t = freshDir("vecpv")
    import spark.implicits._
    val d = (0 until 60).map(i =>
      (i.toLong, s"text $i", Seq("en", "fr", "de")(i % 3)))
      .toDF("doc_id", "text", "lang")
    LakeTxn.appendCommitPartitioned(spark, d, t, "lang")
    val df = spark.read.format("graft-lake").load(t) // lang appended LAST
    df.collect(): Unit
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "pv-last scans should stay columnar")
    assert(df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("en" -> 20L, "fr" -> 20L, "de" -> 20L))
    // schema evolution: files written before the 'quality' column existed
    // null-fill it INSIDE the vectorized reader
    val t2 = freshDir("vecevo")
    val base = (0L until 30L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    LakeTxn.appendCommit(spark, base.repartition(1), t2)
    LakeTxn.appendCommitEvolve(spark,
      (30L until 60L).map(i => (i, s"t$i", i % 7)).toDF("doc_id", "text", "quality"),
      t2)
    val evo = spark.read.format("graft-lake").load(t2)
    evo.collect(): Unit
    assert(evo.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(evo.filter(col("quality").isNull).count() === 30L)
    assert(evo.orderBy("doc_id").collect().map(_.mkString("|")).toSeq ===
      LakeTxn.read(spark, t2).orderBy("doc_id").collect().map(_.mkString("|")).toSeq)
  }

  test("a MID-schema partition value stays columnar (vector reordering, no copies)") {
    val t = freshDir("vecmid")
    import spark.implicits._
    // lang sits at position 1 of 3: the injected vector must be
    // reordered into the middle, not appended
    val d = (0 until 60).map(i =>
      (i.toLong, Seq("en", "fr", "de")(i % 3), s"text $i"))
      .toDF("doc_id", "lang", "text")
    LakeTxn.appendCommit(spark, d.filter(col("doc_id") < 12).repartition(1), t)
    LakeTxn.appendCommitPartitioned(spark, d.filter(col("doc_id") >= 12), t, "lang")
    val df = spark.read.format("graft-lake").load(t)
    assert(df.columns.toSeq === Seq("doc_id", "lang", "text"))
    df.collect(): Unit
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(df.orderBy("doc_id").collect().map(_.mkString("|")).toSeq ===
      d.orderBy("doc_id").collect().map(_.mkString("|")).toSeq)
    // pruning to (lang, text) puts the injected vector FIRST
    val thin = spark.read.format("graft-lake").load(t).select("lang", "text")
      .orderBy("text")
    assert(thin.collect().map(_.mkString("|")).toSeq ===
      d.select("lang", "text").orderBy("text").collect().map(_.mkString("|")).toSeq)
  }

  test("row-group pruning: a selective band decodes k of N groups, hash unchanged") {
    val t = freshDir("rg")
    import spark.implicits._
    // small row groups: one sorted file with MANY groups, so footer
    // min/max can prune below file granularity
    val hc = spark.sparkContext.hadoopConfiguration
    val prior = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try {
      val d = (0L until 200000L).map(i => (i, i * 3 + 1))
        .toDF("k", "v")
      LakeTxn.appendCommit(spark, d.repartitionByRange(1, col("k"))
        .sortWithinPartitions("k"), t)
    } finally {
      if (prior == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prior)
    }
    val file = LakeTxn.snapshot(spark, t).adds.head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$t/${file.file}"),
        spark.sessionState.newHadoopConf())).getFooter
    val nGroups = footer.getBlocks.size()
    assert(nGroups >= 8, s"need many row groups to prove pruning, got $nGroups")
    // a narrow band over the sorted key: the reader must decode only the
    // overlapping groups — observable as the SCAN's output rows (emitted
    // before Spark's residual filter) ≪ the file's total rows
    val band = spark.read.format("graft-lake").load(t)
      .filter(col("k").between(1000L, 2000L))
    val got = band.collect()
    assert(got.length === 1001)
    assert(got.map(_.getLong(1)).sum === (1000L to 2000L).map(_ * 3 + 1).sum)
    val scanRows = band.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics("numOutputRows").value).sum
    assert(scanRows < 200000L / 4,
      s"row-group pruning should decode a fraction of the file, got $scanRows")
  }

  test("column pruning reaches the reader (narrow select over a wide table)") {
    val t = freshDir("prune")
    import spark.implicits._
    val d = (0L until 30L).map(i => (i, s"text $i" * 50, s"src${i % 3}", 10 + i))
      .toDF("doc_id", "text", "source", "n_chars")
    LakeTxn.appendCommit(spark, d.repartition(2), t)
    val thin = spark.read.format("graft-lake").load(t).select("doc_id", "source")
    assert(thin.columns.toSeq === Seq("doc_id", "source"))
    assert(thin.count() === 30L)
    assert(thin.agg(sum("doc_id")).head.getLong(0) === (0L until 30L).sum)
  }
}
