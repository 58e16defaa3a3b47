package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm pass (untimed): session startup, codegen compilation, parquet
    // footers and JIT all land here, so the timed pass below measures
    // steady-state per-query cost — the number that scales to a long-lived
    // cluster, not a cold single-shot JVM.
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    sorted.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case NonFatal(_) => () }
    }
    // two timed passes, min per query: strips background-load noise from
    // the recorded numbers (single runs vary ±2x under machine load).
    // A failing query is recorded ok=false — a regression must never
    // masquerade as a fast time.
    def timedPass(): Map[String, (Double, Boolean)] = sorted.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case NonFatal(_) => false }
      name -> (((System.nanoTime() - t0) / 1e9, ok))
    }.toMap
    val (p1, p2) = (timedPass(), timedPass())
    val results = sorted.map { case (name, _) =>
      (name, math.min(p1(name)._1, p2(name)._1), p1(name)._2 && p2(name)._2)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s"\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val nFailed = results.count(!_._3)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
