package graft.core

import org.apache.spark.sql.DataFrame

/** The checkpoint strategy behind every ITERATIVE operator (PageRank,
  * pointer-jumped components, the suffix-array ladder, BPE merges):
  * each round pins its state so the next round's lineage stays flat.
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
  * Session-conf keyed (not SparkContext-global) so concurrent suites /
  * queries in one JVM choose independently. */
object Checkpoints {
  val ConfKey = "spark.graft.checkpointDir"

  def pin(df: DataFrame, eager: Boolean = true): DataFrame =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir is mkdirs + assignment — cheap and
        // idempotent; re-assert per pin so a conf change mid-session
        // takes effect
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
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
