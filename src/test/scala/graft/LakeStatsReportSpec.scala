package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Log-reported scan statistics and limit pushdown: a small lake table
  * AUTO-broadcasts in joins (no hint), a selective scan advertises its
  * pruned size, and LIMIT n plans only a file-list prefix covering n
  * rows. */
class LakeStatsReportSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lstat_${name}_${System.nanoTime()}"

  private def mk(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"text $i", (10 + i).toLong))
      .toDF("k", "text", "n")
  }

  test("add actions record file bytes; they survive checkpoint round-trips") {
    val t = freshDir("bytes")
    LakeTxn.appendCommit(spark, mk(0 until 100).repartition(3), t)
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.forall(_.bytes > 0L))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    snap.adds.foreach(a => assert(a.bytes ===
      fs.getFileStatus(new org.apache.hadoop.fs.Path(t, a.file)).getLen))
    LakeTxn.checkpointLog(spark, t)
    LakeTxn.appendCommit(spark, mk(100 until 110).repartition(1), t)
    val after = LakeTxn.snapshot(spark, t)
    assert(after.adds.forall(_.bytes > 0L))
  }

  test("a small lake table AUTO-broadcasts in a join - no hint anywhere") {
    val t = freshDir("bcast")
    LakeTxn.appendCommit(spark, mk(0 until 200).repartition(2), t)
    import spark.implicits._
    val big = (0L until 50000L).map(i => (i % 200, i)).toDF("k", "payload")
    val joined = big.join(spark.read.format("graft-lake").load(t), Seq("k"))
      .agg(count(lit(1)).as("n"))
    joined.collect(): Unit
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"log-reported stats should make the small side broadcast:\n${plan.take(800)}")
    assert(joined.collect().head.getLong(0) === 50000L)
  }

  test("pushed filters shrink the advertised stats (pruned size, not table size)") {
    val t = freshDir("pruned")
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, i * 3)).toDF("k", "v")
    LakeTxn.appendCommitStats(spark,
      d.repartitionByRange(8, col("k")).sortWithinPartitions("k"), t, "k")
    def statsOf(df: DataFrame): (Long, Long) = {
      val rel = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
      val st = rel.computeStats()
      (st.sizeInBytes.toLong, st.rowCount.map(_.toLong).getOrElse(-1L))
    }
    val (fullBytes, fullRows) = statsOf(
      spark.read.format("graft-lake").load(t))
    val (bandBytes, bandRows) = statsOf(
      spark.read.format("graft-lake").load(t).filter(col("k").between(0L, 100L)))
    assert(fullRows === 1000L)
    assert(bandRows < fullRows, s"band stats should shrink ($bandRows/$fullRows)")
    assert(bandBytes < fullBytes)
  }

  test("LIMIT plans only a file-list prefix covering the limit") {
    val t = freshDir("limit")
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, s"t$i")).toDF("k", "text")
    LakeTxn.appendCommit(spark, d.repartition(10), t)
    assert(LakeTxn.snapshot(spark, t).adds.size === 10)
    val lim = spark.read.format("graft-lake").load(t).limit(7)
    assert(lim.count() === 7L)
    val scanRows = lim.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics("numOutputRows").value).sum
    assert(scanRows <= 200L,
      s"limit should plan ~1 of 10 files, scan emitted $scanRows rows")
    // a residual filter disables file pruning but stays correct
    val filtered = spark.read.format("graft-lake").load(t)
      .filter(col("k") >= 990L).limit(5)
    assert(filtered.count() === 5L)
    // deletion vectors disable it too; the limit still answers exactly
    LakeTxn.deleteWhereMor(spark, t, col("k") < 3L)
    assert(spark.read.format("graft-lake").load(t).limit(4).count() === 4L)
  }
}
