package graft.core

import org.apache.spark.sql.DataFrame

/** The checkpoint strategy behind the iterative and multi-consumer
  * operators (PageRank, pointer-jumped components, the suffix-array
  * ladder, LSH chains, streaming per-batch folds): each round pins its
  * state so the next round's lineage stays flat.
  *
  * Two implementations, chosen per session by configuration:
  *  - default: `localCheckpoint(eager)` — executor block-manager
  *    storage, zero I/O beyond memory/disk spill. Right for local mode
  *    and for clusters that accept recompute-from-scratch on executor
  *    loss (local checkpoints truncate lineage, so a lost block kills
  *    the job — the documented trade).
  *  - `spark.graft.checkpointDir=<path>` set (session conf): RELIABLE
  *    `checkpoint(eager)` into that directory — the cluster-grade form
  *    that survives executor loss, at the price of writing each pinned
  *    generation to the reliable store. On a 1000-executor run of a
  *    multi-hour ladder this is the difference between losing one task
  *    and losing the job. The directory is operator-managed (point it
  *    at the job's scratch bucket; superseded generations are freed by
  *    `bridge.freeCheckpoint` for block storage, while reliable files
  *    age out with the scratch dir — set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` to have
  *    Spark delete them as references drop).
  *
  * The STRATEGY is session-conf keyed, but the reliable DIRECTORY is
  * `SparkContext.setCheckpointDir` — GLOBAL to the JVM by Spark's own
  * design. Sessions sharing one context must therefore point at the
  * same scratch root (each `setCheckpointDir` call namespaces itself
  * under a fresh UUID subdir, so writes never collide; what is shared
  * is the root's lifetime — do not delete it while any session's
  * pinned state is live). */
object Checkpoints {
  val ConfKey = "spark.graft.checkpointDir"

  /** The conf value the context's checkpoint dir was last set FROM —
    * exact string equality, not substring: `/tmp/ckpt` changing to
    * `/tmp/ck` must re-point the context. */
  private val lastSetFrom = new java.util.concurrent.atomic.AtomicReference[String](null)

  def pin(df: DataFrame, eager: Boolean = true): DataFrame =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (lastSetFrom.getAndSet(dir) != dir || sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** `df.pinCheckpoint()` sugar so iterative operators read like the
    * `localCheckpoint` chains they replace. */
  implicit class Pinnable(private val df: DataFrame) extends AnyVal {
    def pinCheckpoint(eager: Boolean = true): DataFrame = pin(df, eager)
  }
}
