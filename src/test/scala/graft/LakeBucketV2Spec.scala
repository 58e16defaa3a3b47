package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Bucketed tables through the TRANSACTIONAL connector: bucket ids ride
  * the commit log, the V2 scan reports `KeyGroupedPartitioning` over
  * `bucket(n, key)`, the catalog's V2 bucket function completes the
  * storage-partitioned-join handshake, and two same-bucketed lake
  * tables join with ZERO Exchange — while unbucketed/mixed layouts fall
  * back to per-file partitions and stay correct. */
class LakeBucketV2Spec extends SparkSpec {

  private lazy val wh = {
    val dir = s"/tmp/graft_bkt_${System.nanoTime()}"
    spark.conf.set("spark.sql.catalog.gbkt",
      classOf[graft.sources.GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbkt.warehouse", dir)
    spark.sql("CREATE NAMESPACE gbkt.db")
    dir
  }

  private def withSpj[T](body: => T): T = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def rows(r: Range, even: Boolean): DataFrame = {
    import spark.implicits._
    r.map(i => (i.toLong, i * (if (even) 2L else 3L))).toDF("k", "v")
  }

  test("the writer routes every row to its stamped bucket") {
    val t = s"$wh/db/route"
    spark.sql("CREATE TABLE gbkt.db.route (k BIGINT, v BIGINT) USING `graft-lake`")
    LakeTxn.appendCommitBucketed(spark, rows(0 until 200, even = true), t, "k", 8)
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.nonEmpty && snap.adds.forall(a =>
      a.bkCol == "k" && a.bkN == 8L && a.bkId >= 0))
    // one file per non-empty bucket, and every row hashes to its file's id
    assert(snap.adds.map(_.bkId).distinct.size === snap.adds.size)
    snap.adds.foreach { a =>
      val ks = spark.read.parquet(s"$t/${a.file}")
        .select("k").collect().map(_.getLong(0))
      assert(ks.nonEmpty && ks.forall(k =>
        LakeTxn.bucketId(k, 8) === a.bkId.toInt), s"misrouted rows in ${a.file}")
    }
    // full content survives the bucket partitioned read
    assert(spark.table("gbkt.db.route").count() === 200L)
  }

  test("two same-bucketed lake tables join with zero Exchange") {
    val ta = s"$wh/db/ja"
    val tb = s"$wh/db/jb"
    spark.sql("CREATE TABLE gbkt.db.ja (k BIGINT, v BIGINT) USING `graft-lake`")
    spark.sql("CREATE TABLE gbkt.db.jb (k BIGINT, v BIGINT) USING `graft-lake`")
    LakeTxn.appendCommitBucketed(spark, rows(0 until 300, even = true), ta, "k", 8)
    LakeTxn.appendCommitBucketed(spark, rows(100 until 400, even = false), tb, "k", 8)
    withSpj {
      val joined = spark.table("gbkt.db.ja").hint("merge")
        .join(spark.table("gbkt.db.jb"), "k")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan.takeRight(1500))
      assert(!plan.contains("Exchange"), plan.takeRight(1500))
      // and the exchange-free plan returns exactly the plain join
      val got = joined.select("k").orderBy("k").collect().map(_.getLong(0)).toSeq
      assert(got === (100L until 300L).toSeq)
    }
  }

  test("a second bucketed append keeps the layout (multi-file buckets concatenate)") {
    val t = s"$wh/db/multi"
    spark.sql("CREATE TABLE gbkt.db.multi (k BIGINT, v BIGINT) USING `graft-lake`")
    LakeTxn.appendCommitBucketed(spark, rows(0 until 100, even = true), t, "k", 4)
    LakeTxn.appendCommitBucketed(spark, rows(100 until 200, even = true), t, "k", 4)
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.size > 4, "two appends should stack files per bucket")
    withSpj {
      val df = spark.table("gbkt.db.multi")
      // 4 planned partitions = one per bucket, each concatenating files
      assert(df.queryExecution.toRdd.partitions.length === 4)
      assert(df.count() === 200L)
      assert(df.select(sum("k")).head.getLong(0) === (0L until 200L).sum)
    }
  }

  test("a mixed (bucketed + plain) layout falls back to per-file partitions") {
    val t = s"$wh/db/mixed"
    spark.sql("CREATE TABLE gbkt.db.mixed (k BIGINT, v BIGINT) USING `graft-lake`")
    LakeTxn.appendCommitBucketed(spark, rows(0 until 100, even = true), t, "k", 4)
    LakeTxn.appendCommit(spark, rows(100 until 120, even = true).repartition(2), t)
    withSpj {
      val df = spark.table("gbkt.db.mixed")
      assert(df.count() === 120L)
      val joined = spark.table("gbkt.db.mixed").hint("merge")
        .join(rows(0 until 120, even = true), "k")
      assert(joined.count() === 120L) // correct, just shuffled
    }
  }

  test("merge-on-read deletes apply inside bucket partitions") {
    val t = s"$wh/db/dv"
    spark.sql("CREATE TABLE gbkt.db.dv (k BIGINT, v BIGINT) USING `graft-lake`")
    LakeTxn.appendCommitBucketed(spark, rows(0 until 100, even = true), t, "k", 4)
    LakeTxn.deleteWhereMor(spark, t, col("k") % 10 === 1L)
    val df = spark.table("gbkt.db.dv")
    assert(df.count() === 90L)
    assert(df.filter(col("k") % 10 === 1L).count() === 0L)
  }

  test("a non-BIGINT or NULL-carrying key refuses loudly") {
    import spark.implicits._
    val t = s"$wh/db/refuse"
    spark.sql("CREATE TABLE gbkt.db.refuse (k BIGINT, v BIGINT) USING `graft-lake`")
    val narrow = (0 until 10).map(i => (i, i.toLong)).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException](
      LakeTxn.appendCommitBucketed(spark, narrow, t, "k", 4))
    assert(e1.getMessage.contains("must be BIGINT"))
    // NULLs fail INSIDE the write expression (one pass, race-free even
    // for non-deterministic inputs) — the job aborts, nothing commits
    val nulled = Seq((Some(1L), 1L), (None, 2L)).toDF("k", "v")
    val e2 = intercept[Throwable](
      LakeTxn.appendCommitBucketed(spark, nulled, t, "k", 4))
    assert(Iterator.iterate(e2)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => String.valueOf(c.getMessage).contains("must not contain NULLs")),
      e2.toString)
    assert(LakeTxn.listVersions(spark, t).size === 1, // just the CREATE
      "a refused bucketed append must commit nothing")
  }

  test("MoR UPDATE and CDC keep the bucket layout (join stays exchange-free)") {
    val t = s"$wh/db/morb"
    spark.sql("CREATE TABLE gbkt.db.morb (k BIGINT, v BIGINT) USING `graft-lake`")
    LakeTxn.appendCommitBucketed(spark, rows(0 until 200, even = true), t, "k", 8)
    // a MoR update appends rewritten rows: they must stage bucket-split
    // and stamped, or every later join silently pays the full shuffle
    LakeTxn.updateMorWhere(spark, t, col("k") % 7 === 0,
      Seq("v" -> (col("v") + 100000L)))
    import spark.implicits._
    val changes = Seq((1000L, 5L, "upsert"), (3L, 0L, "delete"))
      .toDF("k", "v", "__op")
    LakeTxn.applyChangesMor(spark, t, changes, "k")
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.forall(a => a.bkCol == "k" && a.bkN == 8L && a.bkId >= 0),
      snap.adds.filter(_.bkCol == null).map(_.file).mkString(", "))
    // content correct through the bucket partitions + DV mask
    val df = spark.table("gbkt.db.morb")
    assert(df.count() === 200L) // -1 delete +1 insert
    assert(df.filter(col("k") === 3L).count() === 0L)
    assert(df.filter(col("v") >= 100000L).count() ===
      (0 until 200).count(i => i % 7 == 0 && i != 1000))
    // and the zero-Exchange join survives the row-level operations
    val tb = s"$wh/db/morb2"
    spark.sql("CREATE TABLE gbkt.db.morb2 (k BIGINT, v BIGINT) USING `graft-lake`")
    LakeTxn.appendCommitBucketed(spark, rows(0 until 200, even = false), tb, "k", 8)
    withSpj {
      val joined = spark.table("gbkt.db.morb").hint("merge")
        .join(spark.table("gbkt.db.morb2"), "k")
      val plan = joined.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        plan.takeRight(1500))
      assert(joined.count() === 199L) // k=3 deleted, k=1000 has no right match
    }
  }
}
