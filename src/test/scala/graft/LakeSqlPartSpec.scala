package graft

import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Partitioned tables through the pure-SQL surface: `CREATE TABLE ...
  * PARTITIONED BY (col)` marks the column in the governing schema's
  * field metadata, INSERTs split one staged file per value with the
  * column physically absent (values ride the add actions), and reads
  * prune partitions from the log alone — corruption-proof. */
class LakeSqlPartSpec extends SparkSpec {

  private lazy val (cat, wh) = {
    val dir = s"/tmp/graft_sqlpart_${System.nanoTime()}"
    val c = s"glakesp${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$c.warehouse", dir)
    spark.sql(s"CREATE NAMESPACE $c.db")
    (c, dir)
  }

  import spark.implicits._

  test("CREATE PARTITIONED BY + INSERT: per-value files lacking the column, values in the log") {
    spark.sql(s"CREATE TABLE $cat.db.p (k BIGINT, lang STRING, v STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    (0L until 60L).map(i => (i, Seq("en", "fr", "de")((i % 3).toInt), s"t$i"))
      .toDF("k", "lang", "v").createOrReplaceTempView("lsp_src")
    spark.sql(s"INSERT INTO $cat.db.p SELECT * FROM lsp_src WHERE k % 2 = 0")
    spark.sql(s"INSERT INTO $cat.db.p SELECT * FROM lsp_src WHERE k % 2 = 1")
    val tp = s"$wh/db/p"
    val snap = LakeTxn.snapshot(spark, tp)
    // every add action is stamped; the files physically lack the column
    assert(snap.adds.nonEmpty)
    assert(snap.adds.forall(_.pvCol == "lang"))
    assert(snap.adds.map(_.pvValue).toSet === Set("en", "fr", "de"))
    snap.adds.foreach { a =>
      val cols = spark.read.parquet(s"$tp/${a.file}").columns.toSet
      assert(cols === Set("k", "v"), s"${a.file} must not carry lang")
    }
    // partitioning surfaces through the catalog
    assert(spark.sql(s"DESCRIBE TABLE $cat.db.p").collect()
      .exists(_.getString(0).contains("Part")))
    // full content with the value reinjected mid-schema
    val got = spark.sql(s"SELECT k, lang, v FROM $cat.db.p ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === (0L until 60L).map(i =>
      (i, Seq("en", "fr", "de")((i % 3).toInt), s"t$i")))
  }

  test("partition pruning from the log: other partitions' files are never opened") {
    spark.sql(s"CREATE TABLE $cat.db.pr (k BIGINT, lang STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    (0L until 90L).map(i => (i, Seq("en", "fr", "de")((i % 3).toInt)))
      .toDF("k", "lang").createOrReplaceTempView("lspr_src")
    spark.sql(s"INSERT INTO $cat.db.pr SELECT * FROM lspr_src")
    val tp = s"$wh/db/pr"
    val snap = LakeTxn.snapshot(spark, tp)
    // corrupt every file that is not the 'en' partition
    val keep = snap.adds.filter(_.pvValue == "en").map(_.file).toSet
    val dir = java.nio.file.Paths.get(tp, "data")
    java.nio.file.Files.list(dir).forEach { p =>
      if (!p.getFileName.toString.endsWith(".crc") &&
        !keep.contains(s"data/${p.getFileName}"))
        java.nio.file.Files.write(p, Array.fill[Byte](64)(0x5A)): Unit
    }
    val got = spark.sql(s"SELECT k FROM $cat.db.pr WHERE lang = 'en' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got === (0L until 90L).filter(_ % 3 == 0))
  }

  test("NULL/empty partition values are refused; overwrite and multi-column partitioning too") {
    spark.sql(s"CREATE TABLE $cat.db.pn (k BIGINT, lang STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    Seq((1L, "en"), (2L, null.asInstanceOf[String]))
      .toDF("k", "lang").createOrReplaceTempView("lspn_src")
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.db.pn SELECT * FROM lspn_src"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t => String.valueOf(t.getMessage)
        .contains("__HIVE_DEFAULT_PARTITION__")))
    assert(spark.table(s"$cat.db.pn").count() === 0L, "nothing may land")
    // V2 overwrite of a partitioned table is refused (replaceWhere is
    // the exact path); INSERT OVERWRITE goes through it
    intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $cat.db.pn VALUES (1, 'en')"))
    // more than one partition column is refused at CREATE
    intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.db.p2 (k BIGINT, a STRING, b STRING) " +
        s"USING `graft-lake` PARTITIONED BY (a, b)"))
    // a non-string partition column is refused at CREATE
    intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.db.p3 (k BIGINT, a STRING) " +
        s"USING `graft-lake` PARTITIONED BY (k)"))
  }

  test("INSERT OVERWRITE PARTITION rebuilds exactly the named partition") {
    spark.sql(s"CREATE TABLE $cat.db.po (k BIGINT, lang STRING, v STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    (0L until 60L).map(i => (i, Seq("en", "fr", "de")((i % 3).toInt), s"t$i"))
      .toDF("k", "lang", "v").createOrReplaceTempView("lspo_src")
    spark.sql(s"INSERT INTO $cat.db.po SELECT * FROM lspo_src")
    val tp = s"$wh/db/po"
    val before = LakeTxn.snapshot(spark, tp)
    spark.sql(s"INSERT OVERWRITE $cat.db.po PARTITION (lang = 'en') " +
      s"SELECT k + 1000, concat(v, '!') FROM lspo_src WHERE lang = 'en' AND k < 30")
    val after = LakeTxn.snapshot(spark, tp)
    // other partitions' files are byte-identical survivors
    val keptBefore = before.adds.filter(_.pvValue != "en").map(_.file).toSet
    assert(after.adds.filter(_.pvValue != "en").map(_.file).toSet === keptBefore)
    // the new 'en' files are stamped and physically lack the column
    val newEn = after.adds.filter(_.pvValue == "en")
    assert(newEn.nonEmpty && newEn.forall(_.pvCol == "lang"))
    newEn.foreach(a => assert(
      spark.read.parquet(s"$tp/${a.file}").columns.toSet === Set("k", "v")))
    val got = spark.sql(s"SELECT k, lang, v FROM $cat.db.po ORDER BY k, lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = ((0L until 60L).filterNot(_ % 3 == 0)
      .map(i => (i, Seq("en", "fr", "de")((i % 3).toInt), s"t$i")) ++
      (0L until 30L).filter(_ % 3 == 0).map(i => (i + 1000, "en", s"t$i!")))
      .sortBy(t => (t._1, t._2))
    assert(got === want)
    // the rebuild is ONE commit: removes the old 'en' files + adds
    val acts = LakeTxn.readCommit(spark, tp,
      LakeTxn.listVersions(spark, tp).last)
    assert(acts.exists(!_.add) && acts.exists(_.add))
    assert(acts.filter(!_.add).map(_.file).toSet ===
      before.adds.filter(_.pvValue == "en").map(_.file).toSet)
  }

  test("INSERT OVERWRITE of a different partition's rows than named is refused; nothing commits") {
    spark.sql(s"CREATE TABLE $cat.db.poleak (k BIGINT, lang STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO $cat.db.poleak VALUES (1, 'en'), (2, 'fr')")
    val tp = s"$wh/db/poleak"
    val v = LakeTxn.listVersions(spark, tp).last
    // static-partition INSERT OVERWRITE pins lang='en' as a constant, so
    // a leak cannot even be expressed through PARTITION(...); the V2
    // writeTo API can express it — the scope validation refuses
    import org.apache.spark.sql.functions.{col, lit}
    val e = intercept[Exception] {
      Seq((9L, "de")).toDF("k", "lang")
        .writeTo(s"$cat.db.poleak").overwrite(col("lang") === lit("en"))
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t => String.valueOf(t.getMessage).contains("outside the")))
    assert(LakeTxn.listVersions(spark, tp).last === v, "nothing may commit")
    assert(spark.table(s"$cat.db.poleak").count() === 2L)
  }

  test("the NATIVE streaming sink splits per partition value into a partitioned table") {
    spark.sql(s"CREATE TABLE $cat.db.ps (k BIGINT, lang STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    val srcT = s"$wh/db/_streamsrc"
    val d = (0L until 40L).map(i => (i, Seq("en", "fr")((i % 2).toInt)))
      .toDF("k", "lang")
    LakeTxn.appendCommit(spark, d.repartition(2), srcT)
    val tp = s"$wh/db/ps"
    val q = spark.readStream.format("graft-lake").load(srcT)
      .writeStream.outputMode("append")
      .format("graft-lake")
      .option("checkpointLocation", s"$wh/_psckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(tp)
    q.awaitTermination()
    val snap = LakeTxn.snapshot(spark, tp)
    assert(snap.adds.nonEmpty && snap.adds.forall(_.pvCol == "lang"))
    assert(snap.adds.map(_.pvValue).toSet === Set("en", "fr"))
    snap.adds.foreach(a => assert(
      spark.read.parquet(s"$tp/${a.file}").columns.toSet === Set("k")))
    assert(spark.table(s"$cat.db.ps").count() === 40L)
  }

  test("streaming FROM a partitioned table reinjects values per micro-batch") {
    spark.sql(s"CREATE TABLE $cat.db.pstr (k BIGINT, lang STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    (0L until 30L).map(i => (i, Seq("en", "fr")((i % 2).toInt)))
      .toDF("k", "lang").createOrReplaceTempView("lspstr_src")
    spark.sql(s"INSERT INTO $cat.db.pstr SELECT * FROM lspstr_src WHERE k < 15")
    spark.sql(s"INSERT INTO $cat.db.pstr SELECT * FROM lspstr_src WHERE k >= 15")
    val mem = s"lspstr_${System.nanoTime()}"
    val q = spark.readStream.option("maxVersionsPerBatch", 1)
      .table(s"$cat.db.pstr")
      .groupBy("lang").count()
      .writeStream.outputMode("complete").format("memory").queryName(mem)
      .option("checkpointLocation", s"$wh/_pstrckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(mem).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("en" -> 15L, "fr" -> 15L))
  }

  test("CALL describe_detail reports the snapshot off the log fold") {
    spark.sql(s"CREATE TABLE $cat.db.dd (k BIGINT, lang STRING) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO $cat.db.dd VALUES (1, 'en'), (2, 'fr'), (3, 'en')")
    spark.sql(s"DELETE FROM $cat.db.dd WHERE k < 2")
    val r = spark.sql(s"CALL $cat.system.describe_detail('db.dd')").head
    assert(r.getLong(1) >= 1L, "n_files")
    assert(r.getLong(2) === 3L, "n_rows (pre-DV physical rows)")
    assert(r.getLong(3) > 0L, "n_bytes")
    assert(r.getLong(4) === 1L, "n_dvs")
    assert(r.getLong(6) === 1L && r.getLong(7) === 1L, "protocol")
    assert(r.getString(8) === "lang", "partition_col")
  }

  test("partitioned tables interop: DELETE, UPDATE and time travel still work") {
    spark.sql(s"CREATE TABLE $cat.db.pi (k BIGINT, lang STRING, n BIGINT) " +
      s"USING `graft-lake` PARTITIONED BY (lang)")
    (0L until 40L).map(i => (i, Seq("en", "fr")((i % 2).toInt), i * 10))
      .toDF("k", "lang", "n").createOrReplaceTempView("lspi_src")
    spark.sql(s"INSERT INTO $cat.db.pi SELECT * FROM lspi_src")
    spark.sql(s"DELETE FROM $cat.db.pi WHERE k % 4 = 1")
    spark.sql(s"UPDATE $cat.db.pi SET n = n + 1 WHERE lang = 'fr'")
    val got = spark.sql(s"SELECT k, lang, n FROM $cat.db.pi ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = (0L until 40L).filterNot(_ % 4 == 1).map { i =>
      val fr = i % 2 == 1
      (i, if (fr) "fr" else "en", i * 10 + (if (fr) 1 else 0))
    }
    assert(got === want)
    // time travel to the insert-only version sees everything
    assert(spark.sql(s"SELECT * FROM $cat.db.pi VERSION AS OF 1").count() === 40L)
    // the UPDATE's rewritten files keep the hive invariant: per-value
    // files, column only in the log — so a partition rebuild STILL works
    val snap = LakeTxn.snapshot(spark, s"$wh/db/pi")
    assert(snap.adds.forall(_.pvCol == "lang"),
      "rewritten files must stay partition-stamped")
    snap.adds.foreach(a => assert(
      spark.read.parquet(s"$wh/db/pi/${a.file}").columns.toSet === Set("k", "n")))
    spark.sql(s"INSERT OVERWRITE $cat.db.pi PARTITION (lang = 'en') " +
      s"SELECT 999, 0 FROM (VALUES (1)) t(x)")
    assert(spark.sql(s"SELECT k FROM $cat.db.pi WHERE lang = 'en'")
      .collect().map(_.getLong(0)).toSeq === Seq(999L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.pi WHERE lang = 'fr'")
      .head.getLong(0) === want.count(_._2 == "fr"))
  }
}
