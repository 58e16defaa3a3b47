package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: dump ONE declared query + its oracle SQL for a focused
  * DuckDB compare (args: queryName sfDir outDir). */
object ScratchQ {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle.sql"),
      SparkEntry.oracleSql(name))
    spark.stop()
  }
}
