package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev scratch: per-micro-batch duration breakdown for the stream_join
  * drain (args: sfDir). Prints each batch's durationMs map so the drain
  * cost can be attributed (state commit vs planning vs source scan). */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[sprof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
          s"commitMs=${p.stateOperators.map(_.commitTimeMs).mkString(",")}")
      }
    })
    for (parts <- Seq(32, 8, 4, 2); r <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val t0 = System.nanoTime()
      val n = streaming.EventsStream.purchasesAfterErrorsLanded(spark, sfDir).count()
      println(f"[sprof] TOTAL parts=$parts%-3d run$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      Thread.sleep(300)
    }
    spark.stop()
  }
}
