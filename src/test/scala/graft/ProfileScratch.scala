package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling harness — lives in the TEST source set so it never
  * ships in the production jar. Run with
  * `sbt "Test/runMain graft.ProfileScratch"` (env: SPARK_GRAFT_SF_DIR). */
object ProfileScratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 500)

    // warm: full query once
    time("warm dedup_embedding") {
      ext.Dedup.embeddingNearDupClusters(emb, 0.4).count()
    }
    // steady state, twice
    time("dedup_embedding #1") {
      ext.Dedup.embeddingNearDupClusters(emb, 0.4).count()
    }
    time("dedup_embedding #2") {
      ext.Dedup.embeddingNearDupClusters(emb, 0.4).count()
    }
    // sub-stages
    val pairs = time("cosineNearDupPairs") {
      val p = ext.Similarity.cosineNearDupPairs(emb, 0.4).select("a", "b")
      p.count()
      p
    }
    time("clusterPairs") {
      ext.Dedup.clusterPairs(emb.select(col("vec_id")), pairs, "vec_id").count()
    }
    spark.stop()
  }
}
