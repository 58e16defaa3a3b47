package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast,
  *    so the corpus is scanned exactly once with no shuffle of the corpus
  *    side; per-partition ranking keeps only k rows per query per
  *    partition before the final k-row merge. This is the correctness
  *    baseline and is fine whenever |queries| is small.
  *  - [[lshTopK]]: approximate top-k via random-hyperplane LSH. Corpus and
  *    queries are bucketed by sign-pattern; candidates come from an
  *    equi-join on the bucket key, so cost scales with bucket occupancy,
  *    not |corpus|×|queries| — the 100 TB path.
  *
  * All arithmetic is done in DOUBLE with a sequential left-fold
  * (`aggregate`), which both Spark codegen and the DuckDB oracle evaluate
  * in identical element order — cosine scores match bit-for-bit.
  */
object Similarity {

  /** Dot product — the engine's codegen'd expression (strict left-to-right
    * accumulation, bit-identical to a sequential list fold). */
  def dot(a: Column, b: Column): Column = graft.functions.dot_product(a, b)

  /** L2 norm via the same accumulation order. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** (id, v double[], n2 = v·v) — squared norms computed once per row so
    * pair scoring does one dot product instead of three. The final score
    * `dot/(sqrt(n2a)*sqrt(n2b))` is bit-identical to recomputing norms
    * per pair. */
  private def withNorm2(embeddings: DataFrame, idCol: String, vecCol: String,
                        outId: String): DataFrame =
    embeddings.select(col(idCol).as(outId), col(vecCol).cast("array<double>").as(s"v_$outId"))
      .withColumn(s"n2_$outId", dot(col(s"v_$outId"), col(s"v_$outId")))

  private def pairScore(x: String, y: String): Column =
    dot(col(s"v_$x"), col(s"v_$y")) / (sqrt(col(s"n2_$x")) * sqrt(col(s"n2_$y")))

  /** Per-query top-k with bounded shuffle: a TopKAggregator partial keeps
    * ≤ k candidates per (partition, query) map-side, so the exchange
    * carries k·|partitions|·|queries| rows — never the full scored set.
    * Ordering identical to `row_number over (score desc, id)`. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.core.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.core.Scored])
    scored.groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (query rows themselves excluded). Ties broken by vec_id. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = withNorm2(embeddings, idCol, vecCol, "neighbor_id")
    val queries = broadcast(
      withNorm2(embeddings.filter(col(idCol).isin(queryIds: _*)), idCol, vecCol, "query_id"))
    val scored = corpus.crossJoin(queries)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairScore("query_id", "neighbor_id").as("score"))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component: derived from a hash
    * of (plane, dim) mapped into [-1, 1] — no RNG state, so every executor
    * (and every run) derives the same planes. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(2000003L)).cast("double") / 1000001.5d) - 1.0d

  /** Materialize the hash-derived hyperplanes once (driver-side, one tiny
    * local eval of the same expressions) so per-row bucketing runs through
    * the codegen'd dot product instead of an interpreted fold per plane. */
  private def materializePlanes(spark: org.apache.spark.sql.SparkSession,
                                numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    import spark.implicits._
    val flat = (0 until numPlanes).flatMap(p => (0 until dim).map(j => (p, j)))
      .toDF("p", "j")
      .select(col("p"), col("j"),
        planeComponent(col("p"), col("j").cast("long")).as("c"))
      .as[(Int, Int, Double)].collect()
    flat.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
  }

  /** Sign-pattern LSH bucket id for a vector: bit p = sign(v · plane_p). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (pl, p) =>
      when(dot(vec, typedLit(pl)) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k with multi-probe: each query probes its own bucket
    * plus every bucket at Hamming distance 1 (one flipped hyperplane) —
    * the standard recall/cost dial. Candidates come from an equi-join on
    * the bucket key; exact cosine ranks within candidates. Recall is
    * tested against brute force in ScalaTest. */
  /** Empty (query_id, neighbor_id, score, rank) result — the shape every
    * top-k search op returns on an empty corpus. */
  private[ext] def emptyTopK(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType))))

  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int, numPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dimRow = embeddings.select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty) // empty corpus: empty result with the right shape
      return emptyTopK(embeddings.sparkSession)
    val dim = dimRow.head.getInt(0)
    val planes = materializePlanes(embeddings.sparkSession, numPlanes, dim)
    val bucketed = withNorm2(embeddings, idCol, vecCol, "neighbor_id")
      .withColumn("bucket", lshBucket(col("v_neighbor_id"), planes))
    val probes = array(
      (col("bucket") +: (0 until numPlanes).map(p =>
        col("bucket").bitwiseXOR(shiftleft(lit(1L), p)))): _*)
    val queries = broadcast(
      bucketed.filter(col("neighbor_id").isin(queryIds: _*))
        .select(col("neighbor_id").as("query_id"), col("v_neighbor_id").as("v_query_id"),
          col("n2_neighbor_id").as("n2_query_id"), explode(probes).as("bucket")))
    val scored = bucketed.join(queries, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairScore("query_id", "neighbor_id").as("score"))
    // no dedup needed: each corpus vector lives in exactly one bucket, and
    // probe values are distinct, so a candidate pair appears at most once
    topKPerQuery(scored, k)
  }

  /** Array-column statistics per label: vector count, dimension, and the
    * norm envelope (min/max — order-independent double aggregates, unlike
    * a sum of norms, so results are engine-portable). */
  def labelStats(embeddings: DataFrame,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.select(col("label"),
        size(col(vecCol)).cast("long").as("dim"),
        norm(col(vecCol).cast("array<double>")).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), max(col("dim")).as("dim"),
        min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"))
      .orderBy("label")

  /** Top-N most-similar pairs by cosine (a < b) — the bounded, always
    * non-empty form of near-dup pair mining. */
  def topCosinePairs(embeddings: DataFrame, limit: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = withNorm2(embeddings, idCol, vecCol, "a")
    val b = withNorm2(embeddings, idCol, vecCol, "b")
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), pairScore("a", "b").as("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(limit)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    * Exact all-pairs form — the oracle-checked baseline; swap in
    * [[lshTopK]]-style bucketing for web-scale corpora. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = withNorm2(embeddings, idCol, vecCol, "a")
    val b = withNorm2(embeddings, idCol, vecCol, "b")
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), pairScore("a", "b").as("score"))
      .filter(col("score") >= threshold)
      .orderBy("a", "b")
  }
}
