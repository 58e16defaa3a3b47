package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Merge-on-read writes on a hive-PARTITIONED table keep the
  * partitioned-table invariant: the rows `updateMorWhere` /
  * `applyChangesMor` append stage split per partition value with
  * stamped add actions (the column physically absent from the files),
  * so log partition pruning keeps working and a later
  * `INSERT OVERWRITE ... PARTITION` does not refuse. */
class LakeMorPartitionSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_morp_${name}_${System.nanoTime()}"

  private def rows(r: Range): DataFrame = {
    import spark.implicits._
    r.map(i => (i.toLong, Seq("aa", "bb", "cc")(i % 3), i * 10L))
      .toDF("k", "lang", "n")
  }

  test("updateMorWhere stamps its appended files with partition values") {
    val t = freshDir("upd")
    LakeTxn.appendCommitPartitioned(spark, rows(0 until 90), t, "lang")
    val v = LakeTxn.updateMorWhere(spark, t,
      col("k") % 5 === 0, Seq("n" -> (col("n") + 100000L)))
    assert(v > 0)
    // MoR shape: adds + DV, zero removes
    val acts = LakeTxn.readCommit(spark, t, v)
    assert(acts.forall(_.add) && acts.exists(_.dv))
    // EVERY live data file — including the freshly appended rewrites —
    // carries a partition stamp (the hive invariant)
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.forall(_.pvCol == "lang"),
      snap.adds.filter(_.pvCol == null).map(_.file).mkString(", "))
    // content: k%5==0 rows gained 100000, nothing lost
    val got = LakeTxn.read(spark, t)
    assert(got.count() === 90L)
    assert(got.filter(col("n") >= 100000L).count() ===
      rows(0 until 90).filter(col("k") % 5 === 0).count())
    // partition pruning still answers from the log (updated rows of the
    // pruned partitions included)
    val (df, scanned, total) = LakeTxn.readPartitions(spark, t, "lang", Seq("aa"))
    assert(scanned < total)
    assert(df.count() === 30L)
    assert(df.filter(col("lang") =!= "aa").count() === 0L)
  }

  test("applyChangesMor stamps upserts, including brand-new partition values") {
    val t = freshDir("cdc")
    LakeTxn.appendCommitPartitioned(spark, rows(0 until 90), t, "lang")
    import spark.implicits._
    val changes = Seq(
      (3L, "aa", 777L, "upsert"),      // update in an existing partition
      (1000L, "zz", 1L, "upsert"),     // insert into a NEW partition
      (6L, "aa", 0L, "delete"))
      .toDF("k", "lang", "n", "__op")
    val v = LakeTxn.applyChangesMor(spark, t, changes, "k")
    assert(v > 0)
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.forall(_.pvCol == "lang"))
    assert(snap.adds.exists(_.pvValue == "zz"), "the new partition must be stamped")
    val got = LakeTxn.read(spark, t)
    assert(got.count() === 90L) // -1 delete +1 insert
    assert(got.filter(col("k") === 3L).select("n").head.getLong(0) === 777L)
    assert(got.filter(col("k") === 6L).count() === 0L)
    val (zz, _, _) = LakeTxn.readPartitions(spark, t, "lang", Seq("zz"))
    assert(zz.select("k").head.getLong(0) === 1000L)
  }

  test("INSERT OVERWRITE PARTITION still works after a MoR update (SQL end to end)") {
    val wh = freshDir("sql")
    spark.conf.set("spark.sql.catalog.gmorp",
      classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmorp.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE gmorp.db")
      spark.sql("CREATE TABLE gmorp.db.t (k BIGINT, lang STRING, n BIGINT) " +
        "USING `graft-lake` PARTITIONED BY (lang)")
      rows(0 until 90).createOrReplaceTempView("morp_src")
      spark.sql("INSERT INTO gmorp.db.t SELECT k, lang, n FROM morp_src")
      spark.sql("CALL gmorp.system.update_where('db.t', 'k % 5 = 0', " +
        "'n', 'n + 100000')")
      // the MoR update's appended files are partition-stamped, so the
      // partition-scoped overwrite's "every live file partitioned"
      // validation passes instead of refusing
      spark.sql("INSERT OVERWRITE gmorp.db.t PARTITION (lang = 'bb') " +
        "SELECT k + 5000, n FROM morp_src WHERE lang = 'bb' AND k % 2 = 0")
      val got = spark.sql("SELECT k, lang, n FROM gmorp.db.t")
      assert(got.filter(col("lang") === "bb").count() === 15L)
      assert(got.filter(col("lang") === "bb").filter(col("k") < 5000L).count() === 0L)
      // the other partitions kept their MoR-updated content
      assert(got.filter(col("lang") =!= "bb").count() === 60L)
      assert(got.filter(col("n") >= 100000L && col("lang") =!= "bb").count() ===
        rows(0 until 90).filter(col("k") % 5 === 0 && col("lang") =!= "bb").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS gmorp.db.t")
      spark.conf.unset("spark.sql.catalog.gmorp")
      spark.conf.unset("spark.sql.catalog.gmorp.warehouse")
    }
  }
}
