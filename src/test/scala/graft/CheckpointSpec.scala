package graft

import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.functions._

/** Storage discipline of the iterative loops: superseded localCheckpoint
  * generations must be FREED, not left to driver GC. Pins (a) the fact
  * that makes bridge.freeCheckpoint necessary — Dataset.unpersist cannot
  * release checkpoint blocks; (b) that freeCheckpoint does; (c) its
  * conservative no-op on multi-leaf plans; (d) the O(1)-generations bound
  * of Bpe.train end-to-end. */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist does NOT release localCheckpoint blocks (why freeCheckpoint exists)") {
    val before = persistedIds
    val cp = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint should register a persistent RDD")
    cp.unpersist(blocking = true)
    assert((persistedIds -- before) == added,
      "unpersist() routes through the CacheManager and must leave checkpoint blocks pinned")
    bridge.freeCheckpoint(cp) // clean up for the remaining tests
  }

  test("freeCheckpoint releases the blocks, also through a projection") {
    val before = persistedIds
    val cp = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    assert((persistedIds -- before).nonEmpty)
    bridge.freeCheckpoint(cp.select(col("x") * 2 as "y")) // projection over the checkpoint
    assert((persistedIds -- before).isEmpty,
      "freeCheckpoint must unpersist the LogicalRDD behind a projected checkpoint frame")
  }

  test("freeCheckpoint is a no-op on a multi-leaf plan (cannot free a join input)") {
    val before = persistedIds
    val cp = Seq((1, "a"), (2, "b")).toDF("k", "v").localCheckpoint(true)
    val other = Seq((1, 10L), (2, 20L)).toDF("k", "w")
    bridge.freeCheckpoint(cp.join(other, "k"))
    assert((persistedIds -- before).nonEmpty,
      "a join plan containing a checkpoint leaf must be left alone")
    bridge.freeCheckpoint(cp)
    assert((persistedIds -- before).isEmpty)
  }

  test("clusterPairs leaves O(1) live checkpoints however many rounds it runs") {
    // a 9-node chain forces several propagation rounds; at the end only
    // the pair list and the FINAL label generation may hold blocks (both
    // are leaves of the returned lazy plan — superseded generations must
    // have been freed round-by-round)
    val nodes = (0L to 8L).toDF("doc_id")
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val before = persistedIds
    // smallGraphCap = 0 forces the distributed propagation loop — the
    // round-by-round checkpoint hygiene under test lives there
    val out = ext.Dedup.clusterPairs(nodes, pairs, "doc_id", smallGraphCap = 0L)
    assert(out.select("cluster_id").distinct().as[Long].collect().toSeq == Seq(0L))
    assert((persistedIds -- before).size <= 2,
      "only the pair checkpoint and the final label generation may survive")
  }

  test("snapped kmeans frees its training checkpoint before returning") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val before = persistedIds
    assert(ext.Ivf.kmeansAssignSnapped(emb, 8, iters = 2).count() == 500)
    assert((persistedIds -- before).isEmpty,
      "the snapped-vector training table must be released; the result plan re-snaps from the raw table")
  }

  test("Bpe.train leaves exactly one live generation of the word table") {
    val docs = Seq((1L, ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3), "s"))
      .toDF("doc_id", "text", "source")
    val before = persistedIds
    val (merges, words) = ext.Bpe.train(docs, 6, batch = 2) // 3 scans
    assert(merges.size == 6)
    assert((persistedIds -- before).size == 1,
      "after a multi-scan train, only the FINAL word-table generation may hold blocks")
    words.count() // the survivor must still be readable
    bridge.freeCheckpoint(words)
  }
}
