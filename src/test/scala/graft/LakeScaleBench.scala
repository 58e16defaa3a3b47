package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** SCALING.md ladder for the LAKE CONNECTOR's driver-side metadata
  * paths: as the log grows (files × commits), the snapshot fold, the
  * V2 scan's plan step (file pruning + DV load + partition planning)
  * and the log-answered COUNT(*) must stay driver-cheap — these run
  * once per QUERY, so their growth is the planning tax every query on
  * a 100-TB table pays before the first task launches.
  *
  * Usage: Test/runMain graft.LakeScaleBench <workDir>
  * Builds three tables at 1×/3×/10× (200/600/2000 files across
  * 20/60/200 commits — file count AND commit count grow together, the
  * streaming-ingest shape), then times per scale:
  *   fold       LakeTxn.snapshot() with no checkpoint (full log replay)
  *   fold_ckpt  the same fold from a checkpoint (the maintained path)
  *   plan       V2 batch planInputPartitions via toRdd.partitions on a
  *              band-filtered scan (log pruning + reader planning)
  *   count      SELECT count(*) end-to-end (log-answered pushdown)
  * Prints min-of-3 seconds per cell as a markdown row. */
object LakeScaleBench {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft_lake_scale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scales = Seq(("x1", 20, 10), ("x3", 60, 10), ("x10", 200, 10))

    def mmin(reps: Int)(body: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min

    scales.foreach { case (tag, commits, filesPer) =>
      val t = s"$root/$tag"
      val p = new org.apache.hadoop.fs.Path(t)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(new org.apache.hadoop.fs.Path(t, "_graft_log"))) {
        for (c <- 0 until commits) {
          val rows = spark.range(c * 1000L, c * 1000L + 1000L)
            .select(col("id").as("k"), (col("id") * 7L).as("v"))
          LakeTxn.appendCommitStatsMulti(spark,
            rows.repartition(filesPer), t, Seq("k", "v"))
        }
      }
      val nFiles = LakeTxn.snapshot(spark, t).adds.size
      val tFold = mmin(3)(LakeTxn.snapshot(spark, t): Unit)
      // checkpoint once, then time the maintained fold
      LakeTxn.checkpointLog(spark, t)
      val tFoldCkpt = mmin(3)(LakeTxn.snapshot(spark, t): Unit)
      val tPlan = mmin(3) {
        spark.read.format("graft-lake").load(t)
          .filter(col("k") >= 1000L && col("k") < 3000L)
          .queryExecution.toRdd.partitions.length: Unit
      }
      val tCount = mmin(3) {
        spark.read.format("graft-lake").load(t)
          .agg(count(lit(1))).collect(): Unit
      }
      println(f"| $tag ($nFiles files / $commits commits) | $tFold%.3f | " +
        f"$tFoldCkpt%.3f | $tPlan%.3f | $tCount%.3f |")
    }
    spark.stop()
  }
}
