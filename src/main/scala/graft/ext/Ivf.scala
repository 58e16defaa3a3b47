package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

/** IVF-style approximate nearest neighbor: partition the corpus into
  * `nlist` Voronoi cells around k-means centroids, then search only the
  * `nprobe` cells nearest each query.
  *
  * Scale design: centroids are tiny (nlist × dim doubles) and live on the
  * driver/broadcast; corpus assignment is a per-row argmin over literal
  * centroid vectors through the codegen'd dot product — one narrow pass,
  * no shuffle. Search joins queries to cells by cell id (equi-join), so
  * cost scales with cell occupancy × nprobe, not |corpus|.
  *
  * Training is Lloyd's algorithm with deterministic seeding (the `nlist`
  * lowest-id vectors): assignment pass + per-dimension mean, both as
  * DataFrame aggregations; centroids are collected per round (k × dim
  * values — driver-sized by construction).
  */
object Ivf {

  import Similarity.dot

  /** Squared-distance rank surrogate for fixed v: |c|² − 2·v·c (the |v|²
    * term is constant per row, so argmin is unchanged). */
  private[ext] def cellOf(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      struct(
        (lit(c.map(x => x * x).sum) - lit(2.0d) * dot(vec, typedLit(c))).as("d"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** Train `nlist` centroids with `iters` Lloyd rounds. Returns
    * (cell_id, centroid vector) pairs, driver-side. */
  def trainCentroids(embeddings: DataFrame, nlist: Int, iters: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Seq[Double])] =
    trainCentroidsOn(embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .pinCheckpoint(), nlist, iters, idCol)

  /** Lloyd rounds over an ALREADY-MATERIALIZED (idCol, v: array<double>)
    * frame — callers that hold a checkpointed normalized corpus (the
    * cell-pruned pair miner) train directly on it instead of paying a
    * second corpus materialization for a projection of the same rows. */
  private[ext] def trainCentroidsOn(vecs: DataFrame, nlist: Int, iters: Int,
                                    idCol: String): Seq[(Int, Seq[Double])] = {
    var centroids: Seq[(Int, Seq[Double])] = vecs.orderBy(col(idCol)).limit(nlist)
      .select("v").collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) }.toSeq
    if (centroids.isEmpty) return Seq.empty // empty corpus: nothing to train
    for (_ <- 0 until iters) {
      // ONE shuffle per round: the (cell, pos) mean aggregation. Its
      // result is nlist·dim rows — the size of the centroids themselves —
      // so the centroid arrays assemble driver-side instead of through a
      // second collect_list shuffle.
      val assigned = vecs.withColumn("cell", cellOf(col("v"), centroids))
      val meanRows = assigned
        .select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos").agg(avg(col("col")).as("m"))
        .collect()
        .map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2))))
      val byCell: Map[Int, Seq[Double]] = meanRows.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1).map(_._2).toSeq }
      // empty cells keep their previous centroid
      centroids = centroids.map { case (cid, c) => (cid, byCell.getOrElse(cid, c)) }
    }
    centroids
  }

  /** K-means clustering as a first-class output: the (vector, cell)
    * assignment table plus per-cell occupancy — the grouping a semantic
    * dedup or diversity-sampling stage consumes directly (cluster, then
    * cap or dedup within clusters). Same deterministic training as the
    * IVF index (lowest-id seeds, fixed rounds); assignment is the
    * codegen'd per-row argmin — one narrow pass, no shuffle beyond the
    * occupancy count. */
  def kmeansAssign(embeddings: DataFrame, nlist: Int, iters: Int = 5,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = trainCentroids(embeddings, nlist, iters, idCol, vecCol)
    if (centroids.isEmpty)
      return embeddings.select(col(idCol), lit(0).as("cell"),
        lit(0L).as("cell_size")).limit(0)
    val assigned = embeddings.select(col(idCol),
      cellOf(col(vecCol).cast("array<double>"), centroids).as("cell"))
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_size"))
    assigned.join(broadcast(sizes), "cell")
      .select(col(idCol), col("cell"), col("cell_size"))
      .orderBy(idCol)
  }

  // ---- integer-snapped (cross-engine exact) k-means -------------------
  //
  // The float-mean Lloyd above is fine for IVF cell TRAINING (declared
  // approximate, recall-bounded), but its avg(double) centroid update is
  // accumulation-order-dependent, so another engine cannot reproduce the
  // assignments bit-for-bit. The snapped variant quantizes once up front
  // and then stays in EXACT integer arithmetic end-to-end, making the
  // whole clustering a deterministic function of (corpus, nlist, iters)
  // that a SQL oracle replays exactly:
  //
  //  - vectors snap to w_d = floor(x_d * 1e6) + 8e6 (BIGINT-valued).
  //    floor (not round) because floor(double) is identical in every
  //    engine while round's half-case is not; the +8e6 shift keeps every
  //    value non-negative for |x| <= 8, and shifting all dims by a
  //    constant changes NO squared distance and commutes with the mean,
  //    so cluster structure is untouched — it exists purely so the
  //    centroid-snap division below runs on non-negative operands, where
  //    Spark's `div` (truncate) and SQL floor-division agree.
  //  - assignment argmin uses d = |c|^2 - 2 w.c (the |w|^2 term is
  //    per-row constant): while dim * max_snapped^2 <= 2^53 every
  //    partial sum (both engines' summation orders) is EXACT integer
  //    arithmetic in double — e.g. 64-dim unit-norm: 64 * (9e6)^2 ~
  //    5.2e15 < 2^53. snappedAssignment ENFORCES this bound (and the
  //    x >= -8 shift domain) on the actual data and fails loudly past
  //    it; ties break to the lowest cell id in both engines.
  //  - the centroid update sums w_d per (cell, dim) as BIGINT and snaps
  //    the mean to round-half-up integer via (2s + n) div (2n); empty
  //    cells keep their previous centroid.
  //
  // Quantization at 1e-6 resolution is the DEFINED metric of this
  // operator (inputs are float32 with ~1e-7 relative precision, so the
  // snap is at the data's own noise floor), not an approximation of a
  // float path: the exact-match oracle holds at any scale because both
  // engines compute the same integers, not because floats happen to
  // agree. Long-sum headroom: the snap computes 2s + n, so the binding
  // bound is 2 * 9e6 * rows < 2^63 — ~5e11 rows per cell. Both halves
  // fail LOUDLY past it, never silently wrong: the distributed sum
  // under Spark ANSI throws on Long overflow, and the driver-side snap
  // uses multiplyExact/addExact; the fix at that scale is a
  // DECIMAL(38,0) sum.

  private[ext] val SnapScale = 1000000L
  private[ext] val SnapShift = 8000000L

  /** The header's exactness argument is a BOUND, not a property of the
    * formulas: every |c|^2 / w·c partial sum (and the oracle's mixed-sign
    * prefix sums — per-term magnitude <= wmax^2) is exact in double iff
    * dim * wmax^2 <= 2^53, and the shift keeps operands non-negative only
    * for inputs >= -8. Checked on the ACTUAL data (one tiny agg over the
    * snapped frame's `w` column), so a 768-dim or out-of-domain corpus
    * fails LOUDLY instead of silently drifting from the oracle. */
  private[ext] def requireExactBound(vecs: DataFrame): Unit = {
    val bound = vecs.agg(
      max(size(col("w"))), min(array_min(col("w"))), max(array_max(col("w"))))
      .head()
    if (!bound.isNullAt(0)) {
      require(!bound.isNullAt(1) && !bound.isNullAt(2),
        "exact-integer bound undefined: every embedding array is empty (dim 0) — " +
          "a zero-dimensional corpus has no cells to assign; filter empty vectors out " +
          "or fix the upstream embedding column")
      val (dim, wmin, wmax) = (bound.getInt(0), bound.getDouble(1), bound.getDouble(2))
      require(wmin >= 0.0,
        s"snapped coordinate $wmin < 0: input magnitude exceeds the |x| <= 8 shift domain")
      require(dim.toDouble * wmax * wmax <= 9.007199254740992e15,
        f"exact-integer bound exceeded: dim($dim) * max_snapped($wmax%.0f)^2 = " +
          f"${dim.toDouble * wmax * wmax}%.3g > 2^53 — assignments would leave the " +
          "exact double-integer range and silently diverge from the SQL oracle; " +
          "reduce dimensionality/magnitude or use the float-path kmeansAssign")
    }
  }

  /** Quantize a float-array column to integral-valued doubles (exact in
    * double up to 2^53 — see header note). */
  private[ext] def snapVec(vec: Column): Column =
    transform(vec.cast("array<double>"),
      x => floor(x * lit(SnapScale.toDouble)) + lit(SnapShift.toDouble))

  /** Argmin cell over snapped centroids: d = |c|^2 − 2 w·c, exact. */
  private[ext] def cellOfSnapped(w: Column, centroids: Seq[(Int, Seq[Long])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      val cn2 = c.map(x => x * x).sum.toDouble // exact: < 2^53
      struct(
        (lit(cn2) - lit(2.0d) * dot(w, typedLit(c.map(_.toDouble)))).as("d"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** Lloyd rounds in snapped-integer arithmetic; seeds are the `nlist`
    * lowest-id vectors (snapped). Same per-round shape as the float
    * trainer: one (cell, pos) aggregation shuffle, nlist·dim rows back
    * to the driver. */
  private[ext] def trainCentroidsSnapped(vecs: DataFrame, nlist: Int, iters: Int,
                                         idCol: String): Seq[(Int, Seq[Long])] = {
    var centroids: Seq[(Int, Seq[Long])] = vecs.orderBy(col(idCol)).limit(nlist)
      .select("w").collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).map(_.toLong).toSeq) }.toSeq
    if (centroids.isEmpty) return Seq.empty
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("cell", cellOfSnapped(col("w"), centroids))
      val rows = assigned
        .select(col("cell"), posexplode(col("w")))
        .groupBy("cell", "pos")
        .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          // driver-side snap: exact ops so the ~5e11-rows-per-cell bound
          // (see header) fails loudly instead of wrapping Long arithmetic
          val (s, n) = (r.getLong(2), r.getLong(3))
          val snapped = Math.addExact(Math.multiplyExact(2L, s), n) / (2 * n)
          (r.getInt(0), (r.getInt(1), snapped))
        }
      val byCell: Map[Int, Seq[Long]] = rows.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1).map(_._2).toSeq }
      centroids = centroids.map { case (cid, c) => (cid, byCell.getOrElse(cid, c)) }
    }
    centroids
  }

  /** Train snapped centroids and return the raw (id, cell) assignment —
    * the shared core of [[kmeansAssignSnapped]] and
    * [[TrainingPipeline.diversityCap]]; consumers that don't need the
    * occupancy column or the presentation sort build on this so those
    * stages never enter their plans. Empty corpus → empty frame. */
  private[ext] def snappedAssignment(embeddings: DataFrame, nlist: Int, iters: Int,
                                     idCol: String, vecCol: String): DataFrame = {
    val vecs = embeddings.select(col(idCol), snapVec(col(vecCol)).as("w"))
      .pinCheckpoint()
    requireExactBound(vecs)
    val centroids = trainCentroidsSnapped(vecs, nlist, iters, idCol)
    // training is done with the checkpointed projection; the returned
    // plan re-snaps from the raw table instead (one narrow codegen'd
    // pass) so it stays lazy and transparent — and the training
    // checkpoint can be released NOW rather than held by the result
    org.apache.spark.sql.graft.bridge.freeCheckpoint(vecs)
    if (centroids.isEmpty)
      return embeddings.select(col(idCol), lit(0).as("cell")).limit(0)
    embeddings.select(col(idCol),
      cellOfSnapped(snapVec(col(vecCol)), centroids).as("cell"))
  }

  /** [[kmeansAssign]] in snapped-integer arithmetic: bit-identical
    * assignments in any engine that replays the same integer recipe —
    * the cross-engine-exact clustering a graded pipeline stage should
    * use. Output shape matches kmeansAssign: (id, cell, cell_size). */
  def kmeansAssignSnapped(embeddings: DataFrame, nlist: Int, iters: Int = 5,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = snappedAssignment(embeddings, nlist, iters, idCol, vecCol)
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_size"))
    assigned.join(broadcast(sizes), "cell")
      .select(col(idCol), col("cell"), col("cell_size"))
      .orderBy(idCol)
  }

  /** [[ivfTopK]] with the INDEX side in snapped-integer arithmetic:
    * centroid training, corpus cell assignment, and the per-query probe
    * ranking all run on the exact integer recipe of
    * [[kmeansAssignSnapped]], so the CANDIDATE SET is a deterministic
    * function of (corpus, nlist, nprobe, iters) any engine reproduces
    * bit-for-bit; rescoring inside candidates is the raw double cosine
    * with the engine's strict fold order — the same score arithmetic the
    * hash-matched brute-force query already shares with the oracle. Net:
    * still an ANN (the probe set bounds recall exactly like ivfTopK), but
    * exact-match gradeable instead of rows-only.
    *
    * Scale shape identical to ivfTopK: driver-sized centroids, one narrow
    * assignment pass, equi-join on cell id, bounded top-k. */
  def ivfTopKSnapped(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                     nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecs = embeddings.select(col(idCol), snapVec(col(vecCol)).as("w"))
      .pinCheckpoint()
    requireExactBound(vecs)
    val centroids = trainCentroidsSnapped(vecs, nlist, iters, idCol)
    org.apache.spark.sql.graft.bridge.freeCheckpoint(vecs)
    if (centroids.isEmpty) // empty corpus: empty result with the right shape
      return Similarity.emptyTopK(embeddings.sparkSession)
    val corpus = embeddings
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("v_neighbor_id"))
      .withColumn("n2_neighbor_id", dot(col("v_neighbor_id"), col("v_neighbor_id")))
      .withColumn("cell", cellOfSnapped(snapVec(col("v_neighbor_id")), centroids))
    // probe ranking on the same exact integer distances as the assignment:
    // array_sort on (d, cid) structs == order by d, cell — ties to the
    // lowest cell id in both engines
    val probeCells = array_sort(array(centroids.map { case (cid, c) =>
      val cn2 = c.map(x => x * x).sum.toDouble // exact: requireExactBound holds
      struct(
        (lit(cn2) - lit(2.0d) * dot(col("w_query"), typedLit(c.map(_.toDouble)))).as("d"),
        lit(cid).as("cid"))
    }: _*))
    val queries = broadcast(
      embeddings.filter(col(idCol).isin(queryIds: _*))
        .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("v_query_id"))
        .withColumn("n2_query_id", dot(col("v_query_id"), col("v_query_id")))
        .withColumn("w_query", snapVec(col("v_query_id")))
        .withColumn("cell", explode(transform(slice(probeCells, 1, nprobe), x => x.getField("cid"))))
        .drop("w_query"))
    val scored = corpus.join(queries, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_query_id"), col("v_neighbor_id")) /
          (sqrt(col("n2_query_id")) * sqrt(col("n2_neighbor_id")))).as("score"))
    Similarity.topKPerQuery(scored, k)
  }

  /** IVF top-k: probe the `nprobe` cells nearest each query, exact cosine
    * within candidates, bounded top-k aggregation. */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = trainCentroids(embeddings, nlist, iters, idCol, vecCol)
    if (centroids.isEmpty) // empty corpus: empty result with the right shape
      return Similarity.emptyTopK(embeddings.sparkSession)
    val corpus = embeddings
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("v_neighbor_id"))
      .withColumn("n2_neighbor_id", dot(col("v_neighbor_id"), col("v_neighbor_id")))
      .withColumn("cell", cellOf(col("v_neighbor_id"), centroids))
    // each query explodes to its nprobe nearest cells
    val probeCells = array_sort(array(centroids.map { case (cid, c) =>
      struct((lit(c.map(x => x * x).sum) - lit(2.0d) * dot(col("v_query_id"), typedLit(c))).as("d"),
        lit(cid).as("cid"))
    }: _*))
    val queries = broadcast(
      embeddings.filter(col(idCol).isin(queryIds: _*))
        .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("v_query_id"))
        .withColumn("n2_query_id", dot(col("v_query_id"), col("v_query_id")))
        .withColumn("cell", explode(transform(slice(probeCells, 1, nprobe), x => x.getField("cid")))))
    val scored = corpus.join(queries, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("v_query_id"), col("v_neighbor_id")) /
          (sqrt(col("n2_query_id")) * sqrt(col("n2_neighbor_id")))).as("score"))
    val topk = udaf(new graft.core.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.core.Scored])
    scored.groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }
}
