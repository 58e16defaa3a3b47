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

    // `jaccard` arg: run ONLY the prefix-vs-naive threshold-join study
    if (args.headOption.contains("jaccard")) {
      val docs = Tables.documents(spark, sfDir)
      time("warmup (naive t=0.5)") {
        ext.Dedup.ngramJaccardPairs(docs).filter(col("jaccard") >= 0.5).count()
      }
      for (t <- Seq(0.3, 0.5, 0.8)) {
        val n = time(f"naive  full-join  t=$t%.1f") {
          ext.Dedup.ngramJaccardPairs(docs).filter(col("jaccard") >= t).count()
        }
        val p = time(f"prefix filtered   t=$t%.1f") {
          ext.Dedup.prefixJaccardPairs(docs, t).count()
        }
        require(n == p, s"prefix != naive at t=$t: $n vs $p")
      }
      // the regime the prefix filter exists for: boilerplate-heavy docs.
      // Every doc shares a hot template tail, so the naive inverted join
      // emits ~n²/2 candidate pairs per hot shingle; the prefix ordering
      // puts those shingles last, so they never enter any prefix.
      val boiler = " all rights reserved subscribe to our newsletter for weekly updates and exclusive offers today"
      val hot = docs.limit(2000)
        .withColumn("text", concat(col("text"), lit(boiler)))
        .localCheckpoint(true)
      for (t <- Seq(0.8)) {
        val p = time(f"BOILERPLATE prefix   t=$t%.1f (2k docs)") {
          ext.Dedup.prefixJaccardPairs(hot, t).count()
        }
        val n = time(f"BOILERPLATE naive    t=$t%.1f (2k docs)") {
          ext.Dedup.ngramJaccardPairs(hot).filter(col("jaccard") >= t).count()
        }
        require(n == p, s"prefix != naive on boilerplate at t=$t: $n vs $p")
      }
      spark.stop(); return
    }

    // sim_pq decomposition: joint-subspace Lloyd training vs encode+ADC
    locally {
      val embAll = Tables.embeddings(spark, sfDir)
      time("warm sim_pq") {
        ext.Pq.pqTopK(embAll, 0L until 8L, 5, m = 4, ksub = 16).count()
      }
      time("sim_pq #1") {
        ext.Pq.pqTopK(embAll, 0L until 8L, 5, m = 4, ksub = 16).count()
      }
      val books = time("  trainCodebooks(iters=5)") {
        ext.Pq.trainCodebooks(embAll, 4, 16, 5)
      }
      time("  trainCodebooks(iters=2)") {
        ext.Pq.trainCodebooks(embAll, 4, 16, 2)
      }
      time("  encode+score (given books)") {
        ext.Pq.encode(embAll, books).count()
      }
      // recall vs iteration count: is round 5 buying anything?
      val brute = ext.Similarity.bruteForceTopK(embAll, 0L until 8L, 5)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (it <- Seq(1, 2, 3, 5)) {
        val ann = ext.Pq.pqTopK(embAll, 0L until 8L, 5, m = 4, ksub = 16, iters = it)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[profile]   pq recall iters=$it: ${(brute & ann).size.toDouble / brute.size}%.3f")
      }
      for (it <- Seq(1, 2, 3, 5)) {
        val t0 = System.nanoTime()
        val ann = ext.Ivf.ivfTopK(embAll, 0L until 8L, 5, 16, 4, iters = it)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[profile]   ivf recall iters=$it: ${(brute & ann).size.toDouble / brute.size}%.3f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
      }
    }

    // clean_corpus decomposition: quality gate -> exact dedup -> minhash
    // near-dup keep-one; the keep-one is the clusterPairs consumer
    val docsAll = Tables.documents(spark, sfDir)
    time("warm clean_corpus") {
      ext.TrainingPipeline.cleanCorpus(docsAll, 0.3, baseHash = ext.Dedup.polyHash).count()
    }
    time("clean_corpus #1") {
      ext.TrainingPipeline.cleanCorpus(docsAll, 0.3, baseHash = ext.Dedup.polyHash).count()
    }
    time("  nearDupKeepIds alone") {
      ext.Dedup.nearDupKeepIds(docsAll, 0.3, ext.Dedup.polyHash).count()
    }
    time("  minhash pairs alone") {
      ext.Dedup.minhashNearDuplicates(docsAll, 0.3, baseHash = ext.Dedup.polyHash).count()
    }

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
    // round structure of the propagation: replicate clusterPairs inline
    // with per-round timing to see where the seconds go
    locally {
      val idCol = "vec_id"
      val p = time("  pairs checkpoint") {
        pairs.select(col("a"), col("b")).localCheckpoint(true)
      }
      val edges = p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      var labels = time("  labels init") {
        edges.select(col("src").as(idCol)).distinct()
          .select(col(idCol), col(idCol).as("cluster_id")).localCheckpoint(true)
      }
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 100) {
        val t0 = System.nanoTime()
        val neighborMin = edges
          .join(labels.select(col(idCol).as("dst"), col("cluster_id").as("nl")), "dst")
          .groupBy(col("src").as(idCol)).agg(min(col("nl")).as("nmin"))
        val relaxed = labels.join(neighborMin, Seq(idCol), "left")
          .select(col(idCol), col("cluster_id").as("old"),
            least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
              .as("mid"))
        val jumped = if (iter < 2) relaxed.withColumnRenamed("mid", "cluster_id") else {
          val lookup = relaxed.select(col(idCol).as("__hop_id"), col("mid").as("__hop"))
          relaxed.join(lookup, col("mid") === col("__hop_id"), "left")
            .select(col(idCol), col("old"),
              coalesce(col("__hop"), col("mid")).as("cluster_id"))
        }
        val next = jumped.localCheckpoint(true)
        val tCkpt = (System.nanoTime() - t0) / 1e9
        changed = next.filter(col("cluster_id") =!= col("old")).count()
        labels = next.select(col(idCol), col("cluster_id"))
        iter += 1
        println(f"[profile]   round $iter: changed=$changed ckpt=$tCkpt%.3f total=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
