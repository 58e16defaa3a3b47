package graft

import org.apache.spark.sql.SparkSession

/** One-call builder for a session tuned the way the engine expects:
  * AQE on, shuffle partitions sized to cores (not the 200 default),
  * UTC timestamps, custom functions injected via [[GraftExtensions]]. */
object GraftSession {
  def build(master: String = "local[*]",
            shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      // runtime skew mitigation: a pathological key (one user's events,
      // one hot token) splits into subpartitions instead of one straggler
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // coalesce tiny post-shuffle partitions toward the advisory size so
      // a 100 TB job doesn't schedule millions of near-empty reduce tasks
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
      // scan granularity: 256 MB splits keep the task count ~400k at
      // 100 TB — large enough to amortize scheduling, small enough that a
      // partition's rows fit executor memory with headroom for spill
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may have returned a pre-existing session whose builder
    // never saw the extensions — make function registration unconditional
    functions.registerSql(spark)
    spark
  }
}
