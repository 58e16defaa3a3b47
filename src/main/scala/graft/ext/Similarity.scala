package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

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
  private[ext] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
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

  /** Hard-negative mining for contrastive training: for each query
    * vector, its `k` highest-cosine corpus vectors that are NOT in its
    * semantic near-dup cluster — the closest non-positives, which are
    * exactly the informative negatives a contrastive loss wants (random
    * negatives are trivially separable; cluster-mates would be false
    * negatives). The positive set is the query's
    * [[Dedup.embeddingNearDupClusters]] component, so a paraphrase that
    * shares no surface text still never leaks in as a "negative".
    *
    * Scale shape: cluster labels are the IVF-pruned pointer-jumped
    * components graded elsewhere; scoring is broadcast queries × one
    * corpus scan; the exclusion is an id-keyed equi-join on the cluster
    * label; top-k is a bounded TopKAggregator partial agg. */
  def hardNegatives(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                    threshold: Double = 0.4, nlist: Int = 16,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val clusters = Dedup.embeddingNearDupClusters(embeddings, threshold, nlist, idCol, vecCol)
    val corpus = withNorm2(embeddings, idCol, vecCol, "neighbor_id")
    val queries = broadcast(
      withNorm2(embeddings.filter(col(idCol).isin(queryIds: _*)), idCol, vecCol, "query_id"))
    val scored = corpus.crossJoin(queries)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairScore("query_id", "neighbor_id").as("score"))
    val qc = broadcast(clusters.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col("cluster_id").as("__qcl")))
    val nc = clusters.select(col(idCol).as("neighbor_id"), col("cluster_id").as("__ncl"))
    topKPerQuery(scored
      .join(qc, "query_id")
      .join(nc, "neighbor_id")
      .filter(col("__qcl") =!= col("__ncl"))
      .select("query_id", "neighbor_id", "score"), k)
  }

  /** Binary-quantization signature of a ≤64-dim vector: bit i set iff
    * component i is strictly positive, packed into two 32-bit-halved
    * longs (`lo` = dims 1–32, `hi` = dims 33–64; keeping each shift
    * under 32 sidesteps the engines' differing 1<<63 sign conventions).
    * 64 floats (256 B) collapse to 16 B — the 16× scan-cost cut that
    * makes the Hamming coarse pass worth running at corpus scale. */
  private def binarySig(df: DataFrame, idCol: String, vecCol: String,
                        out: String): DataFrame = {
    def half(off: Int) =
      s"aggregate(transform(slice($vecCol, $off, 32), (x, i) -> " +
        "IF(x > 0, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)"
    df.select(col(idCol).as(out),
      expr(half(1)).as(s"lo_$out"), expr(half(33)).as(s"hi_$out"))
  }

  /** Binary-quantized two-stage retrieval: a COARSE pass ranks the
    * corpus by Hamming distance between sign-bit signatures (ties to
    * the smaller neighbor id), keeping `candidates` per query; the
    * exact full-precision cosine then re-ranks just those candidates —
    * the binary-quantization recipe production vector stores run when
    * even int8 vectors are too big to scan. Output carries the coarse
    * Hamming distance next to the exact score so the two rankings'
    * disagreement is itself observable.
    *
    * Scale shape: the corpus-side scan touches only the 16-byte
    * signature column (broadcast query signatures × one scan; the
    * XOR+popcount is codegen'd integer arithmetic); full-width vectors
    * are read only for the |queries|·candidates winners via id-keyed
    * equi-joins. Both top-k stages are bounded TopKAggregator partial
    * aggs — no window over the corpus. */
  def hammingTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                  candidates: Int = 25,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && candidates >= k, "k must be positive, candidates >= k")
    val corpusSig = binarySig(embeddings, idCol, vecCol, "neighbor_id")
    val querySig = broadcast(
      binarySig(embeddings.filter(col(idCol).isin(queryIds: _*)), idCol, vecCol, "query_id"))
    val ham = corpusSig.crossJoin(querySig)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (bit_count(expr("lo_neighbor_id ^ lo_query_id")) +
          bit_count(expr("hi_neighbor_id ^ hi_query_id"))).cast("long").as("hamming"))
    // negated distance reuses the (score desc, id asc) top-k aggregator:
    // -hamming desc == hamming asc, ties to the smaller neighbor id
    val cand = topKPerQuery(
      ham.select(col("query_id"), col("neighbor_id"),
        (-col("hamming")).cast("double").as("score")), candidates)
      .join(ham, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"))
    val rescored = cand
      .join(withNorm2(embeddings, idCol, vecCol, "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(withNorm2(embeddings.filter(col(idCol).isin(queryIds: _*)),
        idCol, vecCol, "query_id")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairScore("query_id", "neighbor_id").as("score"))
    topKPerQuery(rescored, k)
      .join(cand, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        col("score"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Matryoshka (MRL-style) two-stage retrieval: a COARSE pass scores
    * the corpus on only the first `prefixDims` dimensions — the
    * information a Matryoshka-trained embedding front-loads — keeping
    * `candidates` per query; the exact full-dimension cosine then
    * re-ranks just those candidates. At scale the coarse stage reads a
    * fraction of the vector bytes (or a materialized narrow prefix
    * column) and full-width vectors are touched only
    * |queries| × candidates times — the standard accuracy-preserving
    * cost cut for embedding retrieval. Ties at BOTH stages break by
    * neighbor_id, so the candidate set — not just the final scores — is
    * deterministic and mirrored by the oracle. */
  def matryoshkaTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     prefixDims: Int = 16, candidates: Int = 25,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(prefixDims > 0 && k > 0 && candidates >= k,
      "prefixDims and k must be positive, candidates >= k")
    def prefixSide(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as(out),
          slice(col(vecCol).cast("array<double>"), 1, prefixDims).as(s"v_$out"))
        .withColumn(s"n2_$out", dot(col(s"v_$out"), col(s"v_$out")))
    val queriesOnly = embeddings.filter(col(idCol).isin(queryIds: _*))
    val coarse = topKPerQuery(
      prefixSide(embeddings, "neighbor_id")
        .crossJoin(broadcast(prefixSide(queriesOnly, "query_id")))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          pairScore("query_id", "neighbor_id").as("score")),
      candidates)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = coarse
      .join(withNorm2(embeddings, idCol, vecCol, "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(withNorm2(queriesOnly, idCol, vecCol, "query_id")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairScore("query_id", "neighbor_id").as("score"))
    topKPerQuery(rescored, k)
  }

  /** k-NN majority-vote classification: predict each query vector's label
    * from its `k` exact nearest neighbors (query excluded) — the
    * composition a label-propagation / weak-supervision pipeline runs to
    * extend sparse labels over an embedded corpus. Vote ties break toward
    * the SMALLER label, neighbor-set ties at the rank-k boundary toward
    * the smaller neighbor id (both deterministic, both mirrored by the
    * oracle). Output carries the vote count and the query's true label so
    * the same frame doubles as a leave-one-out accuracy report.
    *
    * Scale shape: inherits [[bruteForceTopK]]'s broadcast-queries × one
    * corpus scan (swap in the candidate-set overloads for corpus-scale
    * query sets); the label attach is an id-keyed equi-join and the vote
    * argmax is one max-struct aggregation — no window over the corpus. */
  def knnClassify(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val nn = bruteForceTopK(embeddings, queryIds, k, idCol, vecCol)
    val labels = embeddings.select(col(idCol).as("neighbor_id"),
      col(labelCol).cast("long").as("nlabel"))
    nn.join(labels, "neighbor_id")
      .groupBy("query_id", "nlabel").agg(count(lit(1)).as("votes"))
      .groupBy("query_id")
      .agg(max(struct(col("votes"), (-col("nlabel")).as("neg"))).as("__w"),
        sum(col("votes")).as("k_used"))
      .select(col("query_id"), (-col("__w.neg")).as("pred_label"),
        col("__w.votes").as("votes"), col("k_used"))
      .join(embeddings.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("true_label")), "query_id")
      .orderBy("query_id")
  }

  /** Exact radius (range) search: every corpus vector within cosine ≥
    * `threshold` of each query — the "all sufficiently-similar" form of
    * retrieval (dedup sweeps, recall-complete candidate generation),
    * where top-k's fixed cutoff would truncate dense neighborhoods and
    * pad sparse ones.
    *
    * Scale shape: queries broadcast with precomputed norms, ONE corpus
    * scan, and the threshold filter runs map-side — only qualifying
    * (query, neighbor, score) rows ever leave the scan stage, so output
    * size is the result size, not |corpus|·|queries|. At corpus scale the
    * same exact filter runs after LSH/IVF candidate generation instead of
    * the full scan — concretely: the `candidates` overload below scores a
    * pre-built (query_id, neighbor_id) set from [[lshCandidates]] (or an
    * IVF cell-assignment join). */
  def radiusSearch(embeddings: DataFrame, queryIds: Seq[Long], threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = withNorm2(embeddings, idCol, vecCol, "neighbor_id")
    val queries = broadcast(
      withNorm2(embeddings.filter(col(idCol).isin(queryIds: _*)), idCol, vecCol, "query_id"))
    corpus.crossJoin(queries)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        pairScore("query_id", "neighbor_id").as("score"))
      .filter(col("score") >= threshold)
      .orderBy("query_id", "neighbor_id")
  }

  /** [[radiusSearch]] over a PRE-BUILT candidate set — the corpus-scale
    * composition: generate (query_id, neighbor_id) candidates with
    * [[lshCandidates]] (or an IVF cell join), then run the identical
    * exact cosine filter over candidates only. Equal to the full scan
    * whenever the candidate set covers every qualifying pair (spec-proved
    * on a planted clustered fixture); recall below that is the candidate
    * generator's dial, never the scorer's.
    *
    * Scale shape: two id-keyed equi-joins attach vectors+norms to the
    * candidate rows, so cost scales with |candidates|, and the query set
    * may itself be corpus-sized — no broadcast, no crossJoin. (No default
    * args: Scala allows them on one overload only.) */
  def radiusSearch(embeddings: DataFrame, candidates: DataFrame, threshold: Double,
                   idCol: String, vecCol: String): DataFrame =
    scoreCandidates(embeddings, candidates, idCol, vecCol,
      pairScore("query_id", "neighbor_id"))
      .filter(col("score") >= threshold)
      .orderBy("query_id", "neighbor_id")

  /** Attach vectors + norms to (query_id, neighbor_id) candidate rows and
    * score each pair exactly: the shared tail of the composition
    * overloads. Self-pairs are dropped AND the candidate set is deduped
    * here — the docstrings invite mixing candidate generators (LSH ∪ IVF
    * ∪ custom), and a duplicated pair would otherwise occupy two top-k
    * slots or emit twice from the radius form, breaking the full-scan
    * equivalence. (When candidates are already unique the distinct rides
    * the same exchange the scoring joins need anyway.) */
  private def scoreCandidates(embeddings: DataFrame, candidates: DataFrame,
                              idCol: String, vecCol: String, score: Column): DataFrame = {
    val q = withNorm2(embeddings, idCol, vecCol, "query_id")
    val c = withNorm2(embeddings, idCol, vecCol, "neighbor_id")
    candidates.select(col("query_id"), col("neighbor_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .join(q, "query_id").join(c, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), score.as("score"))
  }

  /** Exact maximum-inner-product top-k (MIPS): [[bruteForceTopK]] ranked by
    * raw dot product instead of cosine — the retrieval scoring for
    * embeddings whose norm carries signal (recommendation scores, learned
    * rerankers). Same bounded-shuffle plan: queries broadcast, one corpus
    * scan, TopKAggregator partials keep ≤ k rows per (partition, query).
    *
    * Scale note: the approximate path for MIPS is norm augmentation —
    * append sqrt(M² − ‖v‖²) to each corpus vector and 0 to each query
    * (Bachrach et al. 2014, "Speeding Up the Xbox Recommender") — which
    * turns inner-product ranking into cosine ranking, so [[lshCandidates]]
    * and the IVF path apply unchanged at corpus scale; the `candidates`
    * overload below then rescores with the RAW dot product. */
  def mipsTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = withNorm2(embeddings, idCol, vecCol, "neighbor_id")
    val queries = broadcast(
      withNorm2(embeddings.filter(col(idCol).isin(queryIds: _*)), idCol, vecCol, "query_id"))
    val scored = corpus.crossJoin(queries)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("v_query_id"), col("v_neighbor_id")).as("score"))
    topKPerQuery(scored, k)
  }

  /** [[mipsTopK]] over a PRE-BUILT candidate set — same composition as
    * the `radiusSearch` candidates overload: candidates from
    * [[lshCandidates]] on norm-augmented vectors (or an IVF cell join),
    * exact raw-dot rescoring + bounded TopKAggregator ranking here.
    * Equal to the full scan whenever candidates cover each query's true
    * top-k (spec-proved on the planted fixture). No default args: Scala
    * allows them on one overload only. */
  def mipsTopK(embeddings: DataFrame, candidates: DataFrame, k: Int,
               idCol: String, vecCol: String): DataFrame =
    topKPerQuery(scoreCandidates(embeddings, candidates, idCol, vecCol,
      dot(col("v_query_id"), col("v_neighbor_id"))), k)

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

  /** Empty (query_id, neighbor_id, score, rank) result — the shape every
    * top-k search op returns on an empty corpus. */
  private[ext] def emptyTopK(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.LongType))))

  /** Empty (a, b, score) result — the shape pair mining returns on an
    * empty corpus. */
  private def emptyPairs(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.DoubleType))))

  /** Approximate top-k with multi-probe: each query probes its own bucket
    * plus every bucket at Hamming distance 1 (one flipped hyperplane) —
    * the standard recall/cost dial. Candidates come from an equi-join on
    * the bucket key; exact cosine ranks within candidates. Recall is
    * tested against brute force in ScalaTest.
    *
    * Bucket-count scaling rule: expected bucket occupancy is n/2^planes
    * and per-query candidate work is (planes+1)·n/2^planes, so grow
    * `numPlanes` with the corpus — numPlanes ≈ log2(n) − 10 keeps ~1k
    * vectors per bucket (e.g. 8 planes at 256k vectors, 20 planes at
    * 10⁹); recall lost to narrower buckets is bought back with more
    * Hamming probes, not fewer planes. */
  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int, numPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lshProbeJoined(embeddings, queryIds, numPlanes, idCol, vecCol) match {
      case None => emptyTopK(embeddings.sparkSession) // empty corpus
      case Some(joined) => topKPerQuery(
        joined.select(col("query_id"), col("neighbor_id"),
          pairScore("query_id", "neighbor_id").as("score")), k)
    }

  /** The multi-probe LSH bucket join [[lshTopK]] and [[lshCandidates]]
    * share: corpus side bucketed once (carrying vectors + norms for
    * downstream scoring — Catalyst prunes them when the caller keeps
    * only the id pair), query side broadcast with its own bucket plus
    * every Hamming-1 probe. No dedup needed: each corpus vector lives in
    * exactly one bucket and probe values are distinct, so a candidate
    * pair appears at most once. None on an empty corpus. */
  private def lshProbeJoined(embeddings: DataFrame, queryIds: Seq[Long], numPlanes: Int,
                             idCol: String, vecCol: String): Option[DataFrame] = {
    val dimRow = embeddings.select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty) return None
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
    Some(bucketed.join(queries, "bucket")
      .filter(col("neighbor_id") =!= col("query_id")))
  }

  /** LSH candidate GENERATION for a query set: the multi-probe bucket
    * join of [[lshTopK]], emitting bare (query_id, neighbor_id) pairs
    * instead of scoring them — the input the `radiusSearch`/`mipsTopK`
    * candidates overloads consume. Splitting generation from exact
    * rescoring is the corpus-scale shape: candidates are built once per
    * query batch and can feed several scorers (radius sweep, MIPS, a
    * custom filter) without re-bucketing.
    *
    * Same bucket join, probe policy and `numPlanes` scaling rule as
    * [[lshTopK]] — one shared implementation, so the two can never
    * diverge. */
  def lshCandidates(embeddings: DataFrame, queryIds: Seq[Long], numPlanes: Int = 8,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lshProbeJoined(embeddings, queryIds, numPlanes, idCol, vecCol) match {
      case None => // empty corpus: empty (query_id, neighbor_id) result
        emptyTopK(embeddings.sparkSession).select("query_id", "neighbor_id")
      case Some(joined) => joined.select("query_id", "neighbor_id")
    }

  /** Index-quality report: per-query recall@k of an approximate top-k
    * result against the exact one — the monitoring a production ANN
    * index runs on a probe set (recall drift is how quantization/bucket
    * misconfiguration is caught before it poisons retrieval). Both
    * inputs are (query_id, neighbor_id, …) top-k frames; the report is
    * |ann ∩ exact| per query with the exact set's size as denominator.
    * Recall is one double division over exact integer counts —
    * engine-portable. The left join keeps queries the ANN missed
    * entirely (n_hits 0), which is precisely the alert case.
    *
    * Scale shape: two id-keyed equi-joins over k·|probe set| rows —
    * driver-bounded by construction, like every probe-set artifact. */
  def recallReport(ann: DataFrame, exact: DataFrame): DataFrame = {
    val a = ann.select(col("query_id"), col("neighbor_id"))
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    e.groupBy("query_id").agg(count(lit(1)).as("k_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("k_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall",
        col("n_hits").cast("double") / col("k_exact").cast("double"))
      .orderBy("query_id")
  }

  /** MRR report — the rank-aware sibling of [[recallReport]] (recall
    * can't see WHERE in the list the truth lands): for each query, where
    * the exact top-1 neighbor sits in the ANN list. Columns:
    * (query_id, truth_top1, hit_rank, rr) with hit_rank 0 / rr 0.0 when
    * the index misses the true nearest entirely; the mean of `rr` is the
    * index's MRR. Generic over any two (query_id, neighbor_id, rank)
    * frames, like the recall monitor. One 1-row-per-query equi-join. */
  def mrrReport(ann: DataFrame, exact: DataFrame): DataFrame =
    exact.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("truth_top1"))
      .join(ann.select(col("query_id"), col("neighbor_id").as("truth_top1"),
        col("rank").as("hit_rank")), Seq("query_id", "truth_top1"), "left")
      .select(col("query_id"), col("truth_top1"),
        coalesce(col("hit_rank"), lit(0L)).as("hit_rank"),
        when(col("hit_rank").isNull, lit(0.0d))
          .otherwise(lit(1.0d) / col("hit_rank").cast("double")).as("rr"))
      .orderBy("query_id")

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

  /** Scored candidate pairs (a < b) from LSH buckets: each vector lands in
    * exactly one sign-pattern bucket; the LEFT side probes its own bucket
    * plus every bucket within Hamming distance `maxHamming`, the RIGHT
    * side carries its bucket only — so a pair whose buckets differ in
    * d ≤ maxHamming planes meets on exactly one probe (no dedup needed),
    * and the all-pairs crossJoin never materializes.
    *
    * Scale rule: candidate volume within a bucket is ~(n/2^planes)², so
    * `numPlanes` must grow with the corpus — keep 2^numPlanes ≳ n/1000
    * (e.g. 20 planes at 10⁹ vectors) and the per-bucket work stays flat
    * while probe fan-out grows only quadratically in numPlanes. */
  private def bucketedScoredPairs(embeddings: DataFrame, numPlanes: Int, maxHamming: Int,
                                  idCol: String, vecCol: String): DataFrame = {
    require(numPlanes <= 20, "probe enumeration is exponential in numPlanes")
    val dimRow = embeddings.select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty) // empty corpus: empty (a, b, score) result
      return emptyPairs(embeddings.sparkSession)
    val dim = dimRow.head.getInt(0)
    val planes = materializePlanes(embeddings.sparkSession, numPlanes, dim)
    val base = withNorm2(embeddings, idCol, vecCol, "a")
      .filter(col("n2_a") > 0) // zero-norm: no direction, NaN scores — excluded
      .withColumn("bucket", lshBucket(col("v_a"), planes))
    val masks = (0L until (1L << numPlanes))
      .filter(m => java.lang.Long.bitCount(m) <= maxHamming)
    val left = base.select(col("a"), col("v_a"), col("n2_a"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("probe"))
    val right = base.select(col("a").as("b"), col("v_a").as("v_b"),
      col("n2_a").as("n2_b"), col("bucket").as("probe"))
    left.join(right, "probe")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), pairScore("a", "b").as("score"))
  }

  /** EXACT thresholded pair mining with IVF cell-pair pruning — the
    * scale-safe replacement for an all-pairs crossJoin that still returns
    * the mathematically exact answer (an approximate plan could not: the
    * top pairs of a moderate-similarity corpus spread across LSH buckets,
    * measured at 14+/50 misses for sign-LSH at any practical probe dial).
    *
    * Geometry: on the unit sphere, cos(a,b) ≥ t ⇔ ‖â−b̂‖ ≤ √(2−2t). Assign
    * every (normalized) vector to its nearest of `nlist` k-means cells and
    * record each cell's radius; by the triangle inequality a pair from
    * cells (i, j) can only qualify when d(cᵢ,cⱼ) − rᵢ − rⱼ ≤ √(2−2t). Cell
    * pairs failing that bound are pruned on the DRIVER (nlist² checks);
    * survivors become a broadcast (ci, cj) list and candidates come from
    * two equi-joins on cell id — never a CartesianProduct (asserted in
    * PlanSpec). Scoring inside candidates uses the raw vectors and the
    * same strict fold as the oracle, so surviving scores are bit-exact;
    * pruning decisions carry a 1e-9 slack so float error can't drop a
    * boundary pair. Cost scales with how clustered the corpus is (pruning
    * is what an exact answer costs — sub-quadratic work for every corpus
    * whose near-dup mass is clustered, which is what `nlist` dials). */
  /** Normalized, checkpointed side for cell-pruned exact pair mining:
    * (out, v_out, n2_out, vhat). Zero-norm vectors have no direction
    * (cosine undefined) — excluded here AND in the *Exact cross-checks,
    * or their NaNs would poison cell radii / score ordering and silently
    * drop valid pairs. One sqrt per row, not per element. */
  private def normalizedSide(df: DataFrame, idCol: String, vecCol: String,
                             out: String): DataFrame =
    withNorm2(df, idCol, vecCol, out)
      .filter(col(s"n2_$out") > 0)
      .withColumn("__rinv", lit(1.0) / sqrt(col(s"n2_$out")))
      .withColumn("vhat", transform(col(s"v_$out"), x => x * col("__rinv")))
      .drop("__rinv")
      .pinCheckpoint() // reused by training, assignment and join sides

  /** Per-cell radius max ‖v̂ − c_cell‖ over an assigned (cell, vhat)
    * frame — one aggregation, nlist rows to the driver. */
  private def cellRadii(assigned: DataFrame, cvecs: Seq[Seq[Double]],
                        cn2: Seq[Double]): Map[Int, Double] = {
    val ownC = element_at(typedLit(cvecs), col("cell") + 1)
    val d2 = lit(1.0) + element_at(typedLit(cn2), col("cell") + 1) -
      lit(2.0) * dot(col("vhat"), ownC)
    assigned.select(col("cell"), sqrt(greatest(d2, lit(0.0))).as("r"))
      .groupBy("cell").agg(max(col("r")).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
  }

  /** Driver-side cell-pair pruning (nlist × nlist distance checks): by
    * the triangle inequality a pair from cells (i, j) can only reach
    * cosine ≥ minCosine when d(cᵢ,cⱼ) − rᵢ − rⱼ ≤ √(2−2·minCosine); the
    * 1e-9 slack keeps float error from dropping a boundary pair.
    * `orderedOnly` emits i ≤ j (same-table mining); the cross-corpus
    * form needs both orientations. */
  private def prunedCellPairs(cvecs: IndexedSeq[Seq[Double]], radius: Map[Int, Double],
                              minCosine: Double, orderedOnly: Boolean): Seq[(Int, Int)] = {
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCosine)) + 1e-9
    def dist(x: Seq[Double], y: Seq[Double]): Double =
      math.sqrt(x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum)
    val cids = cvecs.indices
    for {
      i <- cids; j <- cids if !orderedOnly || i <= j
      if dist(cvecs(i), cvecs(j)) - radius.getOrElse(i, 0.0) - radius.getOrElse(j, 0.0) <= maxDist
    } yield (i, j)
  }

  private def cellPrunedScoredPairs(embeddings: DataFrame, minCosine: Double, nlist: Int,
                                    idCol: String, vecCol: String): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // normalized copies drive the geometry; raw vectors + norms score
    val base = normalizedSide(embeddings, idCol, vecCol, "a")
    // train straight on the checkpointed rows (vhat is already double[]):
    // routing through the public trainCentroids would materialize the
    // corpus a second time for the same data
    val centroids = Ivf.trainCentroidsOn(
      base.select(col("a"), col("vhat").as("v")), nlist, iters = 2, "a")
    if (centroids.isEmpty) // empty corpus: empty (a, b, score) result
      return emptyPairs(spark)
    val assigned = base.withColumn("cell", Ivf.cellOf(col("vhat"), centroids))
    val cvecs = centroids.sortBy(_._1).map(_._2).toIndexedSeq
    val cn2 = cvecs.map(c => c.map(x => x * x).sum)
    val radius = cellRadii(assigned, cvecs, cn2)
    val cellPairs = prunedCellPairs(cvecs, radius, minCosine, orderedOnly = true)
    val cellPairsDf = broadcast(cellPairs.toDF("ci", "cj"))
    val x = assigned.select(col("a"), col("v_a"), col("n2_a"), col("cell"))
    val y = assigned.select(col("a").as("b"), col("v_a").as("v_b"),
      col("n2_a").as("n2_b"), col("cell").as("cell_y"))
    x.join(cellPairsDf, col("cell") === col("ci"))
      .join(y, col("cell_y") === col("cj"))
      .filter(col("cell") < col("cell_y") || (col("cell") === col("cell_y") && col("a") < col("b")))
      .select(least(col("a"), col("b")).as("pa"), greatest(col("a"), col("b")).as("pb"),
        pairScore("a", "b").as("score"))
      .withColumnRenamed("pa", "a").withColumnRenamed("pb", "b")
  }

  /** Top-N most-similar pairs by cosine (a < b) — the bounded, always
    * non-empty form of near-dup pair mining. EXACT, without an all-pairs
    * crossJoin: a cheap LSH-bucketed pass seeds a threshold (the Nth-best
    * candidate score is a valid lower bound on the true Nth score — seed
    * quality affects only pruning efficiency, never correctness), then
    * [[cellPrunedScoredPairs]] finds every pair at or above it exactly
    * and the true top-N is selected from those.
    *
    * Bounded collect: the seed pass pulls at most `limit` (score, a, b)
    * rows to the driver — the requested result size, never a
    * corpus-scaled set. */
  def topCosinePairs(embeddings: DataFrame, limit: Int, nlist: Int = 16,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val seed = bucketedScoredPairs(embeddings, numPlanes = 6, maxHamming = 1, idCol, vecCol)
      .orderBy(col("score").desc).limit(limit).collect()
    val t = if (seed.length < limit) -1.0 else seed.map(_.getDouble(2)).min
    cellPrunedScoredPairs(embeddings, t, nlist, idCol, vecCol)
      .filter(col("score") >= t)
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(limit)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold) —
    * EXACT via [[cellPrunedScoredPairs]]; the higher the threshold, the
    * stronger the cell-pair pruning (near-dup mining is the cheap case). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double, nlist: Int = 16,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    cellPrunedScoredPairs(embeddings, threshold, nlist, idCol, vecCol)
      .filter(col("score") >= threshold)
      .orderBy("a", "b")

  /** EXACT cross-corpus thresholded cosine pairs — SEMANTIC test-set
    * decontamination: which training-corpus vectors are embedding-space
    * near-dups of an eval-set vector (paraphrased benchmark leakage that
    * the n-gram decontaminator cannot see). Returns every (corpus_id,
    * eval_id, score) with cosine ≥ `threshold`, exactly.
    *
    * Same geometry as [[cosineNearDupPairs]], across two tables: both
    * sides normalize once (checkpointed), k-means cells train on the
    * union, per-cell radii bound the triangle-inequality pruning, and
    * surviving cell pairs — BOTH orientations, the sides are asymmetric —
    * become a broadcast list feeding two equi-joins on cell id. Never a
    * |corpus|·|eval| crossJoin; cost scales with cross-side cell
    * co-occupancy, which is what a high threshold dials down. In a
    * deployment the eval side is fixed: its normalization, assignment and
    * radii are computed once and reused across ingest batches. Zero-norm
    * vectors have no direction and are never flagged. */
  def crossCosinePairs(corpus: DataFrame, evalSet: DataFrame, threshold: Double,
                       nlist: Int = 16, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the seed-order encoding below ((id*2)/(id*2+1)) needs an integral
    // id — fail up front with the real requirement instead of leaving a
    // fractional/string id to surface as a cast error or (worse) a
    // silently precision-lossy double ordering deep in training
    Seq(corpus -> "corpus", evalSet -> "evalSet").foreach { case (df, side) =>
      val dt = df.schema(idCol).dataType
      require(Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType).contains(dt),
        s"crossCosinePairs: $side.$idCol must be an integral type (got $dt); " +
        "the deterministic seed order encodes ids as id*2 / id*2+1")
    }
    val cSide = normalizedSide(corpus, idCol, vecCol, "corpus_id")
    val eSide = normalizedSide(evalSet, idCol, vecCol, "eval_id")
    // the training union's seed order must stay TOTAL even when the two
    // independently-keyed tables share id values — a side bit folded into
    // the ordering id keeps seeding deterministic (ids must fit 62 bits;
    // ANSI mode throws on overflow rather than silently wrapping)
    val unionHat = cSide.select((col("corpus_id").cast("long") * 2).as("id"), col("vhat").as("v"))
      .unionByName(eSide.select((col("eval_id").cast("long") * 2 + 1).as("id"), col("vhat").as("v")))
    val centroids = Ivf.trainCentroidsOn(unionHat, nlist, iters = 2, "id")
    if (centroids.isEmpty) // both sides empty: empty result, right shape
      return emptyPairs(spark).toDF("corpus_id", "eval_id", "score")
    val aC = cSide.withColumn("cell", Ivf.cellOf(col("vhat"), centroids))
    val aE = eSide.withColumn("cell", Ivf.cellOf(col("vhat"), centroids))
    val cvecs = centroids.sortBy(_._1).map(_._2).toIndexedSeq
    val cn2 = cvecs.map(c => c.map(x => x * x).sum)
    val radius = cellRadii(
      aC.select(col("cell"), col("vhat")).unionByName(aE.select(col("cell"), col("vhat"))),
      cvecs, cn2)
    val cellPairs = prunedCellPairs(cvecs, radius, threshold, orderedOnly = false)
    val cellPairsDf = broadcast(cellPairs.toDF("ci", "cj"))
    aC.drop("vhat").join(cellPairsDf, col("cell") === col("ci"))
      .join(aE.drop("vhat").withColumnRenamed("cell", "cell_y"), col("cell_y") === col("cj"))
      .select(col("corpus_id"), col("eval_id"),
        pairScore("corpus_id", "eval_id").as("score"))
      .filter(col("score") >= threshold)
      .orderBy("corpus_id", "eval_id")
  }

  /** The decontamination decision: corpus rows with NO eval-set match at
    * the threshold (anti-join against the flagged id set). Zero-norm
    * corpus vectors match nothing and are kept. */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame, threshold: Double,
                            nlist: Int = 16, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val flagged = crossCosinePairs(corpus, evalSet, threshold, nlist, idCol, vecCol)
      .select(col("corpus_id").as(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Exact all-pairs top-N by cosine — O(n²) crossJoin; the small-n oracle
    * cross-check for [[topCosinePairs]], never the production path.
    * Zero-norm vectors excluded (cosine undefined), matching the pruned
    * path. */
  def topCosinePairsExact(embeddings: DataFrame, limit: Int,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = withNorm2(embeddings, idCol, vecCol, "a").filter(col("n2_a") > 0)
    val b = withNorm2(embeddings, idCol, vecCol, "b").filter(col("n2_b") > 0)
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), pairScore("a", "b").as("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(limit)
  }

  /** Exact all-pairs thresholded near-dup pairs — the small-n cross-check
    * for [[cosineNearDupPairs]]. */
  def cosineNearDupPairsExact(embeddings: DataFrame, threshold: Double,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = withNorm2(embeddings, idCol, vecCol, "a").filter(col("n2_a") > 0)
    val b = withNorm2(embeddings, idCol, vecCol, "b").filter(col("n2_b") > 0)
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), pairScore("a", "b").as("score"))
      .filter(col("score") >= threshold)
      .orderBy("a", "b")
  }

  /** Per-dimension statistics of an embedding column — the feature-scaling
    * precursor (mean/std per dimension for whitening or normalization
    * audits). One `posexplode` then a dim-keyed aggregation: the shuffle
    * carries only per-partition partial sums per dimension (dim count ≈
    * vector width, so the reduce side is tiny at any corpus size).
    *
    * Sums are integer-scaled (`round(v·1e6)` BIGINT) so accumulation is
    * exact and order-independent; mean/std derive from the exact power
    * sums with one double expression each — the same construction as the
    * portable stats aggregate, deterministic across engines.
    *
    * The squared-term sum is accumulated in DECIMAL(38,0), not BIGINT: each
    * term is ~1e12 for unit-scale values, so a BIGINT running sum overflows
    * at ~9.2M vectors — DECIMAL(38,0) is exact to ~1e26 vectors. It is
    * RENDERED as a double (`sum_sq_scaled`): the exact integer rounds to
    * the nearest IEEE double identically in any engine, keeping the column
    * hash-comparable without exposing engine-specific wide-int types.
    */
  def dimStats(embeddings: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val nD: Column => Column = _.cast("double")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    embeddings
      .select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * 1e6).cast("long").as("__s"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        min(col("__s")).as("min_scaled"),
        max(col("__s")).as("max_scaled"),
        sum(col("__s")).as("sum_scaled"),
        sum((col("__s") * col("__s")).cast(dec38)).as("__sq"))
      .withColumn("sum_sq_scaled", nD(col("__sq")))
      .withColumn("mean", nD(col("sum_scaled")) / (nD(col("n")) * 1e6))
      .withColumn("std", sqrt(
        (nD(col("n")) * col("sum_sq_scaled") - nD(col("sum_scaled")) * nD(col("sum_scaled")))
          / (nD(col("n")) * (nD(col("n")) - 1.0))) / 1e6)
      .select(col("dim"), col("n"), col("min_scaled"), col("max_scaled"),
        col("sum_scaled"), col("sum_sq_scaled"), col("mean"), col("std"))
      .orderBy("dim")
  }

  /** Per-dimension embedding DRIFT between two snapshots (here the
    * even/odd id halves; in production yesterday's batch vs today's):
    * exact integer-scaled sums and counts per side, each side's
    * mean/std, and the mean shift — the distribution-shift report an
    * embedding pipeline reads before trusting a refreshed encoder or a
    * new crawl slice (a drifted dimension breaks every downstream
    * quantizer/index calibrated on the old range). Same integer-domain
    * recipe as [[dimStats]], so every double is a function of exact
    * BIGINT inputs and the row hash-matches across engines.
    *
    * Scale shape: one posexplode → (side, dim)-keyed aggregate (rows =
    * 2 × vector width — tiny at any corpus size), then a dim-keyed
    * self-join of the two tiny sides. */
  def dimDrift(embeddings: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val nD: Column => Column = _.cast("double")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val sides = embeddings
      .select((col(idCol) % 2 === 0).as("__a"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("__a"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * 1e6).cast("long").as("__s"))
      .groupBy("__a", "dim")
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("sum_scaled"),
        sum((col("__s") * col("__s")).cast(dec38)).as("__sq"))
      .withColumn("mean", nD(col("sum_scaled")) / (nD(col("n")) * 1e6))
      .withColumn("std", sqrt(
        (nD(col("n")) * nD(col("__sq")) - nD(col("sum_scaled")) * nD(col("sum_scaled")))
          / (nD(col("n")) * (nD(col("n")) - 1.0))) / 1e6)
    def side(flag: Boolean, suffix: String) =
      sides.filter(col("__a") === flag).select(col("dim"),
        col("n").as(s"n_$suffix"), col("sum_scaled").as(s"sum_${suffix}_scaled"),
        col("mean").as(s"mean_$suffix"), col("std").as(s"std_$suffix"))
    side(true, "a").join(side(false, "b"), "dim")
      .withColumn("mean_shift", col("mean_b") - col("mean_a"))
      .orderBy("dim")
  }

  /** Symmetric per-dimension int8 scalar quantization — the standard
    * embedding-storage compression (4× over float32; PQ's cheaper
    * sibling): each dimension scales by its corpus max-|value| into
    * [-127, 127]. Dequantization is `code · maxabs_d / 127`.
    *
    * Determinism: values enter the integer domain first (the dimStats
    * `round(v·1e6)` scaling), per-dim max-|s| is an exact BIGINT, and the
    * code is `round(s·127.0 / maxabs)` — one double multiply/divide on
    * exact integers, identical in any engine. An all-zero dimension
    * (maxabs = 0) codes to 0.
    *
    * Scale shape: one posexplode → dim-keyed aggregate (rows = vector
    * width — tiny at any corpus size, so it broadcasts back), then a
    * per-vector re-assembly keyed on the id. Codes render as a CSV string
    * so the result is hash-comparable across engines.
    *
    * Columns: vec_id, codes_csv — ordered by vec_id. */
  /** The deterministic ±1 JL matrix, component-major (`k` rows of `dim`
    * signs), from a seeded PRNG. A PRNG matrix — not a hash formula: any
    * per-axis hash combiner (xor, +) makes each sign bit SEPARABLE,
    * sign(d,c) = f(d)·g(c), which is a rank-1 matrix that collapses every
    * component onto one direction; even mixed multiplicative hashes of
    * the pair index leave measurable column correlations. Like the LSH
    * planes, the literal signs are inlined into both the Spark plan and
    * the oracle SQL, so determinism is by construction. */
  def jlSigns(dim: Int, k: Int, seed: Long = 42L): Array[Array[Long]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(k)(Array.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
  }

  /** Johnson-Lindenstrauss random projection to `k` components
    * (Achlioptas-style ±1 sign projection): component c of vector v is
    * Σ_d sign(c,d)·s_d over the exact integer embedding
    * (`round(v_d·1e6)`) — exact BIGINT arithmetic end-to-end, so the
    * projection is hash-graded, not tolerance-graded.
    *
    * Why it matters at 100 TB: JL projection shrinks a D-dim corpus to k
    * dims with bounded pairwise-distance distortion using NO training
    * pass, no codebook, and no state — the cheapest first stage before
    * LSH/IVF when D is wide. Shape: one codegen'd higher-order fold per
    * row (`transform` × `aggregate`) over a k×D literal-sign array folded
    * into the plan as a constant, zero joins, zero shuffles before the
    * final sort. */
  def randomProjection(embeddings: DataFrame, dim: Int, k: Int = 8,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       seed: Long = 42L): DataFrame = {
    require(k > 0 && dim > 0, "k and dim must be positive")
    val signs = jlSigns(dim, k, seed)
    val mat = array(signs.map(row => array(row.map(lit): _*)): _*)
    val projs = transform(sequence(lit(0), lit(k - 1)), c =>
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0L).cast("long"),
        (acc, d) => acc + element_at(element_at(mat, c + 1), d + 1) *
          round(element_at(col(vecCol), d + 1).cast("double") * 1000000.0).cast("long")))
    embeddings
      .select(col(idCol), posexplode(projs).as(Seq("comp", "proj")))
      .select(col(idCol), col("comp").cast("long").as("comp"), col("proj"))
      .orderBy(idCol, "comp")
  }

  def quantizeInt8(embeddings: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    // materialized once: the per-dim scales subjob and the coding join
    // both read it, so the corpus is exploded a single time
    val s = embeddings
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col(idCol), col("dim"),
        round(col("v").cast("double") * 1e6).cast("long").as("__s"))
      .pinCheckpoint()
    val scales = s.groupBy("dim").agg(max(abs(col("__s"))).as("__maxabs"))
    val code = when(col("__maxabs") === 0L, lit(0L)).otherwise(
      round(col("__s").cast("double") * 127.0 / col("__maxabs").cast("double"))
        .cast("long"))
    s.join(broadcast(scales), "dim")
      .select(col(idCol), col("dim"), code.as("__c"))
      .groupBy(idCol)
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("dim"), col("__c")))),
          x => x.getField("__c").cast("string"))).as("codes_csv"))
      .orderBy(idCol)
  }
}
