package graft

import org.apache.spark.sql.functions._

import graft.core.Checkpoints
import graft.ext.Graph

/** The pluggable checkpoint strategy: iterative ladders pin per-round
  * state through `Checkpoints.pin` — local block storage by default,
  * RELIABLE `checkpoint()` under `spark.graft.checkpointDir` when set
  * (the cluster-grade form that survives executor loss) — and produce
  * bit-identical results either way. */
class CheckpointStrategySpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0 until 40).map(i =>
      (i.toLong, s"alpha beta gamma w$i beta alpha delta w${i % 7}"))
      .toDF("doc_id", "text")
  }

  test("the reliable path writes checkpoint files and matches the local path") {
    val edges = Graph.bigramEdges(corpus)
    // 12 rounds crosses the every-10-rounds pin inside pageRank
    val local = Graph.pageRank(edges, iters = 12).collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliable = Graph.pageRank(edges, iters = 12).collect().toSeq
      assert(reliable === local,
        "the ladder must be strategy-invariant (exact integer ranks)")
      // the reliable store actually holds pinned generations
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files written under $dir")
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("pin() routes by session conf") {
    import spark.implicits._
    val df = (1 to 10).toDF("x")
    val localPinned = Checkpoints.pin(df)
    // a local checkpoint plan has a truncated LogicalRDD leaf
    assert(localPinned.queryExecution.analyzed.collectLeaves().size === 1)
    assert(localPinned.collect().map(_.getInt(0)).sorted === (1 to 10).toArray)
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliablePinned = Checkpoints.pin(df)
      assert(reliablePinned.collect().map(_.getInt(0)).sorted === (1 to 10).toArray)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0)
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }
}
