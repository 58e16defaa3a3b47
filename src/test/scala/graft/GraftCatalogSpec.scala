package graft

import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** The V2 TableCatalog over the lake: SQL DDL/DML resolving through the
  * commit log — CREATE/ALTER/DROP/RENAME TABLE, INSERT INTO, SELECT,
  * CTAS, saveAsTable, with CHECK constraints and the protocol gate
  * enforced through the SQL path exactly like the programmatic one. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val wh = {
    val dir = s"/tmp/graft_cat_${System.nanoTime()}"
    spark.conf.set("spark.sql.catalog.glake", classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.glake.warehouse", dir)
    spark.sql("CREATE NAMESPACE glake.db")
    dir
  }

  private def tPath(name: String): String = s"$wh/db/$name"

  test("CREATE TABLE + INSERT INTO + SELECT round-trip through pure SQL") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.docs (doc_id BIGINT, text STRING, n_chars BIGINT) USING `graft-lake`")
    // an empty table is queryable the moment its schema commits
    assert(spark.sql("SELECT * FROM glake.db.docs").count() === 0L)
    import spark.implicits._
    (0L until 40L).map(i => (i, s"text $i", 10 + i))
      .toDF("doc_id", "text", "n_chars").createOrReplaceTempView("src_docs")
    spark.sql("INSERT INTO glake.db.docs SELECT * FROM src_docs WHERE doc_id % 2 = 0")
    spark.sql("INSERT INTO glake.db.docs SELECT * FROM src_docs WHERE doc_id % 2 = 1")
    // two inserts = two commits; content exact through SQL AND the log
    assert(spark.sql("SELECT sum(n_chars) FROM glake.db.docs").head.getLong(0)
      === (0L until 40L).map(10 + _).sum)
    assert(spark.table("glake.db.docs").count() === 40L)
    assert(LakeTxn.read(spark, tPath("docs")).count() === 40L)
    assert(LakeTxn.listVersions(spark, tPath("docs")).size === 3) // create + 2
    assert(spark.sql("SHOW TABLES IN glake.db").collect()
      .map(_.getString(1)).contains("docs"))
  }

  test("ALTER TABLE ADD COLUMN evolves schema-on-log; old rows null-fill") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.evo (k BIGINT, v STRING) USING `graft-lake`")
    spark.sql("INSERT INTO glake.db.evo VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE glake.db.evo ADD COLUMN quality BIGINT")
    spark.sql("INSERT INTO glake.db.evo VALUES (3, 'c', 7)")
    val rows = spark.sql(
      "SELECT k, v, quality FROM glake.db.evo ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ===
      Seq((1L, "a", -1L), (2L, "b", -1L), (3L, "c", 7L)))
    // drops/renames are table rewrites on a lake: refused loudly
    intercept[Exception](spark.sql("ALTER TABLE glake.db.evo DROP COLUMN v"))
  }

  test("CTAS and saveAsTable land as schema commit + appends") {
    wh: Unit
    import spark.implicits._
    (0L until 20L).map(i => (i, i * 2)).toDF("a", "b")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE glake.db.ctas USING `graft-lake` AS SELECT * FROM ctas_src")
    assert(spark.table("glake.db.ctas").agg(sum("b")).head.getLong(0) ===
      (0L until 20L).map(_ * 2).sum)
    (20L until 30L).map(i => (i, i * 2)).toDF("a", "b")
      .write.mode("append").saveAsTable("glake.db.ctas")
    assert(spark.table("glake.db.ctas").count() === 30L)
  }

  test("CHECK constraints and the protocol gate bite through SQL INSERT") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.gated (k BIGINT, n BIGINT) USING `graft-lake`")
    spark.sql("INSERT INTO glake.db.gated VALUES (1, 5)")
    LakeTxn.addConstraint(spark, tPath("gated"), "n_pos", "n >= 0")
    val e = intercept[Exception](
      spark.sql("INSERT INTO glake.db.gated VALUES (2, -1)"))
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[LakeTxn.ConstraintViolationException]),
      s"wanted a constraint violation, got $e")
    // nothing landed, nothing staged
    assert(spark.table("glake.db.gated").count() === 1L)
    spark.sql("INSERT INTO glake.db.gated VALUES (3, 0)")
    assert(spark.table("glake.db.gated").count() === 2L)
    // writer protocol fence: a too-new table refuses SQL writes
    LakeTxn.setProtocol(spark, tPath("gated"), reader = 1, writer = 99)
    val e2 = intercept[Exception](
      spark.sql("INSERT INTO glake.db.gated VALUES (4, 1)"))
    assert(chain(e2).exists(t => t.getMessage != null &&
      t.getMessage.contains("writer protocol")), s"got $e2")
  }

  test("DROP / RENAME / listTables; unsupported shapes are refused loudly") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.tmp1 (k BIGINT) USING `graft-lake`")
    spark.sql("INSERT INTO glake.db.tmp1 VALUES (42)")
    spark.sql("ALTER TABLE glake.db.tmp1 RENAME TO db.tmp2")
    assert(spark.table("glake.db.tmp2").head.getLong(0) === 42L)
    assert(!spark.catalog.tableExists("glake.db.tmp1"))
    spark.sql("DROP TABLE glake.db.tmp2")
    assert(spark.sql("SHOW TABLES IN glake.db").collect()
      .forall(r => r.getString(1) != "tmp2"))
    // single-string-column partitioned CREATE is SUPPORTED (round 19,
    // LakeSqlPartSpec); multi-column partitioning and LOCATION refuse
    spark.sql(
      "CREATE TABLE glake.db.part_ok (k BIGINT, p STRING) USING `graft-lake` PARTITIONED BY (p)")
    spark.sql("DROP TABLE glake.db.part_ok")
    intercept[Exception](spark.sql(
      "CREATE TABLE glake.db.bad (k BIGINT, p STRING, q STRING) USING `graft-lake` PARTITIONED BY (p, q)"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE glake.db.bad2 (k BIGINT) USING `graft-lake` LOCATION '/tmp/elsewhere'"))
    // a nested type is refused at CREATE (atomic-column contract)
    intercept[Exception](spark.sql(
      "CREATE TABLE glake.db.bad3 (k BIGINT, m MAP<STRING, BIGINT>) USING `graft-lake`"))
  }

  test("SQL TIMESTAMP AS OF resolves commit publish times; too-early refuses") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.tt2 (k BIGINT) USING `graft-lake`")
    spark.sql("INSERT INTO glake.db.tt2 VALUES (1), (2)")
    Thread.sleep(1100) // commit mtimes need a clear gap at FS resolution
    val mid = java.time.Instant.ofEpochMilli(System.currentTimeMillis())
    Thread.sleep(1100)
    spark.sql("INSERT INTO glake.db.tt2 VALUES (3)")
    assert(spark.sql(
      s"SELECT * FROM glake.db.tt2 TIMESTAMP AS OF '$mid'").count() === 2L)
    // now (or later) sees everything
    val now = java.time.Instant.ofEpochMilli(System.currentTimeMillis() + 1000)
    assert(spark.sql(
      s"SELECT * FROM glake.db.tt2 TIMESTAMP AS OF '$now'").count() === 3L)
    // a timestamp before the table existed refuses loudly
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM glake.db.tt2 TIMESTAMP AS OF '2001-01-01 00:00:00'").collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t => String.valueOf(t.getMessage)
        .contains("no commit at or before")))
  }

  test("CALL delete_where tombstones untranslatable predicates merge-on-read") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.dw (k BIGINT) USING `graft-lake`")
    import spark.implicits._
    (0L until 30L).toDF("k").createOrReplaceTempView("dw_src")
    spark.sql("INSERT INTO glake.db.dw SELECT * FROM dw_src")
    // `k % 3 = 1` is not source-translatable: DELETE FROM would route to
    // the copy-on-write rewrite; the CALL tombstones instead
    val v = spark.sql("CALL glake.system.delete_where('db.dw', 'k % 3 = 1')")
      .head.getLong(0)
    val acts = LakeTxn.readCommit(spark, tPath("dw"), v)
    assert(acts.forall(_.add) && acts.exists(_.dv),
      "a delete_where commit is a deletion vector, zero rewrites")
    assert(spark.table("glake.db.dw").count() === 20L)
    assert(spark.sql("SELECT * FROM glake.db.dw WHERE k % 3 = 1").count() === 0L)
  }

  test("SQL time travel: VERSION AS OF reads history under its own schema; read-only") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.tt (k BIGINT, v STRING) USING `graft-lake`")
    spark.sql("INSERT INTO glake.db.tt VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("ALTER TABLE glake.db.tt ADD COLUMN q BIGINT")        // v2
    spark.sql("INSERT INTO glake.db.tt VALUES (3, 'c', 9)")         // v3
    assert(spark.sql("SELECT * FROM glake.db.tt").count() === 3L)
    // v1 history: pre-evolution schema (no q column), pre-insert rows
    val v1 = spark.sql("SELECT * FROM glake.db.tt VERSION AS OF 1")
    assert(v1.columns.toSeq === Seq("k", "v"))
    assert(v1.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // the pinned handle refuses writes
    val e = intercept[Exception](spark.sql(
      "INSERT INTO glake.db.tt VERSION AS OF 1 VALUES (9, 'x')"))
    assert(e != null)
    // a nonsense version string is refused loudly
    intercept[Exception](spark.sql(
      "SELECT * FROM glake.db.tt VERSION AS OF 'abc'").collect())
  }

  test("SQL DELETE is a DV commit (no rewrites); TRUNCATE unpins everything") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.del (k BIGINT, lang STRING) USING `graft-lake`")
    import spark.implicits._
    (0L until 60L).map(i => (i, Seq("en", "fr", "de")(i.toInt % 3)))
      .toDF("k", "lang").createOrReplaceTempView("del_src")
    spark.sql("INSERT INTO glake.db.del SELECT * FROM del_src")
    val t = tPath("del")
    val filesBefore = LakeTxn.snapshot(spark, t).files.toSet
    spark.sql("DELETE FROM glake.db.del WHERE lang = 'de'")
    // zero data files rewritten: the delete is a deletion-vector commit
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.files.toSet === filesBefore)
    assert(snap.dvs.nonEmpty)
    assert(spark.sql("SELECT count(*) FROM glake.db.del").head.getLong(0) === 40L)
    assert(spark.sql("SELECT count(*) FROM glake.db.del WHERE lang = 'de'")
      .head.getLong(0) === 0L)
    // a second delete stacks; survivors exact
    spark.sql("DELETE FROM glake.db.del WHERE k < 10")
    assert(spark.table("glake.db.del").collect().map(_.getLong(0)).sorted.toSeq
      === (10L until 60L).filter(_ % 3 != 2))
    // DELETE of nothing is a no-op commit-wise
    val vBefore = LakeTxn.listVersions(spark, t).last
    spark.sql("DELETE FROM glake.db.del WHERE k > 1000000")
    assert(LakeTxn.listVersions(spark, t).last === vBefore)
    // TRUNCATE TABLE: one commit, empty table, history intact
    spark.sql("TRUNCATE TABLE glake.db.del")
    assert(spark.sql("SELECT count(*) FROM glake.db.del").head.getLong(0) === 0L)
    assert(LakeTxn.read(spark, t, asOf = Some(vBefore)).count() > 0L)
    // the table still accepts inserts after truncation
    spark.sql("INSERT INTO glake.db.del VALUES (999, 'en')")
    assert(spark.table("glake.db.del").count() === 1L)
  }

  test("stored procedures: CALL glake.system.* runs lake maintenance in SQL") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.proc (k BIGINT, lang STRING, n BIGINT) USING `graft-lake`")
    import spark.implicits._
    (0L until 40L).map(i => (i, Seq("en", "fr")(i.toInt % 2), 10 + i))
      .toDF("k", "lang", "n").createOrReplaceTempView("proc_src")
    spark.sql("INSERT INTO glake.db.proc SELECT * FROM proc_src WHERE k % 2 = 0")
    spark.sql("INSERT INTO glake.db.proc SELECT * FROM proc_src WHERE k % 2 = 1")
    val t = tPath("proc")
    // checkpoint returns the checkpointed version as a result row
    val ck = spark.sql("CALL glake.system.checkpoint('db.proc')").collect()
    assert(ck.map(_.getLong(0)).toSeq === Seq(2L))
    assert(LakeTxn.listCheckpoints(spark, t) === Seq(2L))
    // merge: the change set rides in as a VIEW (CDC through SQL)
    (0L until 5L).map(i => (i, "xx", 999L, "upsert"))
      .toDF("k", "lang", "n", "__op").createOrReplaceTempView("proc_changes")
    spark.sql("CALL glake.system.merge('db.proc', 'proc_changes', 'k')")
    assert(spark.sql("SELECT count(*) FROM glake.db.proc WHERE lang = 'xx'")
      .head.getLong(0) === 5L)
    // compact packs the accreted files; content unchanged
    val before = spark.table("glake.db.proc").collect().map(_.mkString("|")).sorted
    spark.sql("CALL glake.system.compact('db.proc')")
    assert(LakeTxn.snapshot(spark, t).files.size === 1)
    assert(spark.table("glake.db.proc").collect().map(_.mkString("|")).sorted
      === before)
    // vacuum with defaults (retain_last = 1): live content untouched
    val vac = spark.sql("CALL glake.system.vacuum('db.proc')").collect().head
    assert(vac.getLong(1) > 0L, s"vacuum should delete unpinned files: $vac")
    assert(spark.table("glake.db.proc").count() === 40L)
    // constraints through CALL: a violating INSERT now refuses
    spark.sql("CALL glake.system.add_constraint('db.proc', 'n_pos', 'n >= 0')")
    intercept[Exception](spark.sql("INSERT INTO glake.db.proc VALUES (99, 'en', -1)"))
    spark.sql("CALL glake.system.drop_constraint('db.proc', 'n_pos')")
    spark.sql("INSERT INTO glake.db.proc VALUES (99, 'en', -1)")
    assert(spark.table("glake.db.proc").count() === 41L)
    // unknown procedures are refused loudly
    intercept[Exception](spark.sql("CALL glake.system.explode('db.proc')"))
  }

  test("CALL glake.system.history returns the commit log as rows") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.hist (k BIGINT) USING `graft-lake`")
    spark.sql("INSERT INTO glake.db.hist VALUES (1), (2)")
    spark.sql("INSERT INTO glake.db.hist VALUES (3)")
    spark.sql("DELETE FROM glake.db.hist WHERE k = 1") // a DV commit
    val h = spark.sql("CALL glake.system.history('db.hist')").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6))).sortBy(_._1)
    assert(h.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(h(0)._5 === 1L, "commit 0 carries the schema action")
    assert(h(1)._6 === 2L && h(2)._6 === 1L, "rows added per insert")
    assert(h(3)._4 === 1L, "the delete is a deletion-vector add")
    assert(h.map(_._3).sum === 0L, "no removes anywhere")
  }

  test("the catalog read path is the V2 connector: columnar scan + log pruning") {
    wh: Unit
    spark.sql("CREATE TABLE glake.db.scan (k BIGINT, v BIGINT) USING `graft-lake`")
    import spark.implicits._
    (0L until 1000L).map(i => (i, i * 3)).toDF("k", "v")
      .createOrReplaceTempView("scan_src")
    spark.sql("INSERT INTO glake.db.scan SELECT * FROM scan_src")
    val df = spark.sql("SELECT k, v FROM glake.db.scan WHERE k BETWEEN 10 AND 20")
    assert(df.collect().map(_.getLong(1)).sum === (10L to 20L).map(_ * 3).sum)
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
  }
}
