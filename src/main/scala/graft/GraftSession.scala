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
