package graft

import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** SQL UPDATE and MERGE INTO as group-based copy-on-write row-level
  * operations: runtime group filtering rewrites only files that hold a
  * match, the replace commit is atomic and conflict-checked, and
  * translatable DELETEs still collapse to the metadata DV path. */
class LakeRowLevelSpec extends SparkSpec {

  private lazy val wh = {
    val dir = s"/tmp/graft_rlo_${System.nanoTime()}"
    spark.conf.set("spark.sql.catalog.grlo", classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.grlo.warehouse", dir)
    spark.sql("CREATE NAMESPACE grlo.db")
    dir
  }

  private def tPath(name: String): String = s"$wh/db/$name"

  test("SQL UPDATE rewrites only the files holding a match (copy-on-write)") {
    wh: Unit
    spark.sql("CREATE TABLE grlo.db.up (k BIGINT, band STRING, n BIGINT) USING `graft-lake`")
    import spark.implicits._
    // three inserts = three files with disjoint k bands
    (0L until 90L).map(i => (i, s"b${i / 30}", 10 + i))
      .toDF("k", "band", "n").createOrReplaceTempView("up_src")
    for (b <- 0 to 2)
      spark.sql(s"INSERT INTO grlo.db.up SELECT /*+ REPARTITION(1) */ * " +
        s"FROM up_src WHERE band = 'b$b'")
    val t = tPath("up")
    val before = LakeTxn.snapshot(spark, t)
    assert(before.adds.size === 3)
    // update matches ONLY band b1: exactly that file should be replaced
    spark.sql("UPDATE grlo.db.up SET n = n + 1000 WHERE band = 'b1'")
    val after = LakeTxn.snapshot(spark, t)
    assert(after.adds.size === 3)
    val survivors = before.adds.map(_.file).toSet intersect after.adds.map(_.file).toSet
    assert(survivors.size === 2,
      s"runtime group filtering should rewrite ONE file, kept $survivors")
    // content exact: b1 rows bumped, everything else untouched
    val got = spark.table("grlo.db.up").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = (0L until 90L).map(i =>
      (i, s"b${i / 30}", if (i / 30 == 1) 1010 + i else 10 + i))
    assert(got.toSeq === want)
    // one atomic commit: remove(1) + add(replacement)
    val acts = LakeTxn.readCommit(spark, t, after.version)
    assert(acts.count(!_.add) === 1)
  }

  test("SQL MERGE INTO applies matched-update / not-matched-insert / matched-delete") {
    wh: Unit
    spark.sql("CREATE TABLE grlo.db.mg (k BIGINT, v STRING) USING `graft-lake`")
    spark.sql("INSERT INTO grlo.db.mg VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    import spark.implicits._
    Seq((2L, "B", "u"), (4L, "", "d"), (9L, "I", "i"))
      .toDF("k", "nv", "op").createOrReplaceTempView("mg_src")
    spark.sql(
      """MERGE INTO grlo.db.mg t USING mg_src s ON t.k = s.k
        |WHEN MATCHED AND s.op = 'd' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
    assert(spark.table("grlo.db.mg").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "I")))
  }

  test("an UPDATE violating a CHECK constraint aborts with nothing committed") {
    wh: Unit
    spark.sql("CREATE TABLE grlo.db.upc (k BIGINT, n BIGINT) USING `graft-lake`")
    spark.sql("INSERT INTO grlo.db.upc VALUES (1, 5), (2, 6)")
    LakeTxn.addConstraint(spark, tPath("upc"), "n_pos", "n >= 0")
    val vBefore = LakeTxn.listVersions(spark, tPath("upc")).last
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    val e = intercept[Exception](
      spark.sql("UPDATE grlo.db.upc SET n = -1 WHERE k = 1"))
    assert(chain(e).exists(_.isInstanceOf[LakeTxn.ConstraintViolationException]),
      s"got $e")
    assert(LakeTxn.listVersions(spark, tPath("upc")).last === vBefore)
    assert(spark.table("grlo.db.upc").agg(sum("n")).head.getLong(0) === 11L)
  }

  test("UPDATE composes with deletion vectors (no resurrections) and _file is selectable") {
    wh: Unit
    spark.sql("CREATE TABLE grlo.db.updv (k BIGINT, v BIGINT) USING `graft-lake`")
    import spark.implicits._
    (0L until 40L).map(i => (i, i)).toDF("k", "v")
      .createOrReplaceTempView("updv_src")
    spark.sql("INSERT INTO grlo.db.updv SELECT * FROM updv_src")
    // tombstone k<5 via the metadata DV path, then rewrite via UPDATE:
    // the rewrite must materialize the vectors, never resurrect
    spark.sql("DELETE FROM grlo.db.updv WHERE k < 5")
    spark.sql("UPDATE grlo.db.updv SET v = v * 10 WHERE k >= 30")
    val got = spark.table("grlo.db.updv").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (5L until 40L).map(i => (i, if (i >= 30) i * 10 else i)))
    // the _file metadata column is a plain selectable surface
    val files = spark.sql("SELECT DISTINCT _file FROM grlo.db.updv")
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.startsWith("data/")))
  }
}
