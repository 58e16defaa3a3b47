package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: time named declared queries with the Bench session shape
  * (local[32], 32 shuffle partitions, UTC). Each query runs `reps` times
  * (first run = warm-up with caches cold, later runs show steady state).
  * Args: sfDir query [query...]; env TIMEQ_REPS overrides reps (def 2). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val reps = sys.env.getOrElse("TIMEQ_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeq] $name%-28s run$r  ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($n rows)")
    }
    spark.stop()
  }
}
