package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm via the same fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (query rows themselves excluded). Ties broken by vec_id. */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val queries = broadcast(
      embeddings.filter(col(idCol).isin(queryIds: _*))
        .select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val scored = embeddings.crossJoin(queries)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("qvec"), col(vecCol)).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane component: planes are derived
    * from a hash of (plane, dim), mapped into [-1, 1] — no RNG state, so
    * every executor and every engine derives the same planes. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(2000003L)).cast("double") / 1000001.5d) - 1.0d

  /** Sign-pattern LSH bucket id for a vector: bit p = sign(v · plane_p). */
  def lshBucket(vec: Column, numPlanes: Int): Column = {
    val vd = vec.cast("array<double>")
    (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), size(vd) - 1),
          (x, j) => x * planeComponent(lit(p), j)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Approximate top-k with multi-probe: each query probes its own bucket
    * plus every bucket at Hamming distance 1 (one flipped hyperplane) —
    * the standard recall/cost dial. Candidates come from an equi-join on
    * the bucket key; exact cosine ranks within candidates. Recall is
    * tested against brute force in ScalaTest. */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int, numPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket(col(vecCol), numPlanes))
    val probes = array(
      (col("bucket") +: (0 until numPlanes).map(p =>
        col("bucket").bitwiseXOR(shiftleft(lit(1L), p)))): _*)
    val queries = broadcast(
      bucketed.filter(col(idCol).isin(queryIds: _*))
        .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
          explode(probes).as("bucket")))
    val scored = bucketed.join(queries, "bucket")
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosine(col("qvec"), col(vecCol)).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Top-N most-similar pairs by cosine (a < b) — the bounded, always
    * non-empty form of near-dup pair mining. */
  def topCosinePairs(embeddings: DataFrame, limit: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = embeddings.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = embeddings.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(limit)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    * Exact all-pairs form — the oracle-checked baseline; swap in
    * [[lshTopK]]-style bucketing for web-scale corpora. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = embeddings.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = embeddings.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("score"))
      .filter(col("score") >= threshold)
      .orderBy("a", "b")
  }
}
