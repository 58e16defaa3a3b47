package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Aggregate pushdown answered from the LOG alone: global COUNT(*),
  * COUNT(col), MIN/MAX over stats-mapped columns never open a data
  * file (proven corruption-style); anything the log cannot answer
  * exactly — filters, group-bys, DVs, sums, uncovered columns — falls
  * back to the normal distributed plan and stays correct. */
class LakeAggPushdownSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lagg_${name}_${System.nanoTime()}"

  /** v nullable (null for k % 3 == 0), both INT64. */
  private def rows(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, if (i % 3 == 0) None else Some(i * 10L)))
      .toDF("k", "v")
  }

  private def build(t: String): Unit = {
    LakeTxn.appendCommitStatsMulti(spark,
      rows(0 until 50).repartition(2), t, Seq("k", "v"))
    LakeTxn.appendCommitStatsMulti(spark,
      rows(50 until 100).repartition(2), t, Seq("k", "v"))
  }

  private def aggDf(t: String,
                    sch: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val rd = spark.read.format("graft-lake")
    sch.fold(rd)(rd.schema).load(t)
      .agg(count(lit(1)).as("n"), count(col("v")).as("n_v"),
        min("k").as("min_k"), max("k").as("max_k"),
        min("v").as("min_v"), max("v").as("max_v"))
  }

  test("COUNT/MIN/MAX answer from the log with ZERO data file opens") {
    val t = freshDir("zero")
    build(t)
    // schema captured pre-corruption: planning may legitimately open ONE
    // footer for inference on a schema-less table; the claim under test
    // is the DATA path (and the answer itself)
    val sch = spark.read.format("graft-lake").load(t).schema
    // corrupt EVERY data file: any read attempt would explode
    val dir = java.nio.file.Paths.get(t, "data")
    var corrupted = 0
    java.nio.file.Files.list(dir).forEach { p =>
      if (!p.getFileName.toString.endsWith(".crc")) {
        java.nio.file.Files.write(p, Array.fill[Byte](64)(0x5A)); corrupted += 1
      }
    }
    assert(corrupted >= 4)
    val df = aggDf(t, Some(sch))
    val r = df.collect().head
    assert(r.getLong(0) === 100L) // count(*)
    assert(r.getLong(1) === 100L - 34L) // count(v): k%3==0 null -> 34 nulls
    assert(r.getLong(2) === 0L && r.getLong(3) === 99L) // min/max k
    assert(r.getLong(4) === 10L && r.getLong(5) === 980L) // min/max v (k=99 is null)
    assert(df.queryExecution.executedPlan.toString.contains("answered from log"),
      df.queryExecution.executedPlan.toString.take(600))
  }

  test("the pushed answer equals the computed answer on a clean table") {
    val t = freshDir("eq")
    build(t)
    val pushed = aggDf(t).collect().head
    val computed = LakeTxn.read(spark, t)
      .agg(count(lit(1)), count(col("v")), min("k"), max("k"), min("v"), max("v"))
      .collect().head
    assert(pushed.toSeq === computed.toSeq)
    // time travel pins the answer to the version's own log state
    val v0 = spark.read.format("graft-lake").option("versionAsOf", "0").load(t)
      .agg(count(lit(1)).as("n")).collect().head.getLong(0)
    assert(v0 === 50L)
  }

  test("anything the log cannot answer exactly falls back and stays correct") {
    val t = freshDir("fb")
    build(t)
    // a residual filter blocks pushdown
    val filtered = spark.read.format("graft-lake").load(t)
      .filter(col("k") >= 50L).agg(count(lit(1)).as("n"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("answered from log"))
    assert(filtered.collect().head.getLong(0) === 50L)
    // SUM is not log-answerable
    val summed = spark.read.format("graft-lake").load(t).agg(sum("k").as("s"))
    assert(!summed.queryExecution.executedPlan.toString.contains("answered from log"))
    assert(summed.collect().head.getLong(0) === (0L until 100L).sum)
    // a group-by is not log-answerable
    val grouped = spark.read.format("graft-lake").load(t)
      .groupBy(col("k") % 2).count()
    assert(!grouped.queryExecution.executedPlan.toString.contains("answered from log"))
    assert(grouped.count() === 2L)
    // a live deletion vector blocks pushdown (it may tombstone the extreme)
    LakeTxn.deleteWhereMor(spark, t, col("k") === 99L)
    val dv = aggDf(t)
    assert(!dv.queryExecution.executedPlan.toString.contains("answered from log"))
    val r = dv.collect().head
    assert(r.getLong(0) === 99L && r.getLong(3) === 98L)
    // a table WITHOUT full stats coverage on the agg column falls back
    val t2 = freshDir("nostats")
    LakeTxn.appendCommit(spark, rows(0 until 20).repartition(1), t2)
    val plain = spark.read.format("graft-lake").load(t2)
      .agg(min("k").as("mn"), count(lit(1)).as("n"))
    // count(*) alone would push, but min(k) has no band -> whole agg falls back
    assert(!plain.queryExecution.executedPlan.toString.contains("answered from log"))
    assert(plain.collect().head.getLong(0) === 0L)
  }

  test("COUNT(*) alone stays log-answered on a tombstoned table (rows minus DV rows)") {
    val t = freshDir("dvcount")
    build(t)
    LakeTxn.deleteWhereMor(spark, t, col("k") % 4 === 1L)
    LakeTxn.deleteWhereMor(spark, t, col("k") === 0L) // stacked vector
    val n = spark.read.format("graft-lake").load(t).agg(count(lit(1)).as("n"))
    n.collect(): Unit
    assert(n.queryExecution.executedPlan.toString.contains("answered from log"),
      "the global row count is exactly known from adds minus DV rows")
    assert(n.collect().head.getLong(0) === 100L - 25L - 1L)
    assert(n.collect().head.getLong(0) ===
      LakeTxn.read(spark, t).count(), "must equal the MoR read")
  }
}
