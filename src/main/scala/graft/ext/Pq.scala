package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.Pinnable

/** Product quantization (PQ) for approximate nearest neighbor: split the
  * embedding dimension into `m` subspaces, k-means each subspace into
  * `ksub` centroids (the codebooks), and store every corpus vector as `m`
  * small codes. Queries score candidates with asymmetric distance
  * computation (ADC): the query keeps its full precision and a per-query
  * lookup table turns each code into a partial dot product, so scoring a
  * corpus row is `m` table lookups instead of a `dim`-wide dot product.
  *
  * Scale design: codebooks are m × ksub × (dim/m) doubles — driver-sized
  * by construction, like IVF centroids. The corpus is ENCODED ONCE into
  * m·log2(ksub) bits per vector (a 32× compression for float32 at the
  * defaults) in one narrow pass with no shuffle; searches scan codes, not
  * raw vectors, so the working set a 100 TB search touches shrinks by the
  * same factor. Query tables are |Q|·m·ksub doubles, broadcast. The final
  * top-k rides the same bounded TopKAggregator as every other search op.
  *
  * This is an approximation (quantization error moves scores), so the
  * declared query is rows-only; the ScalaTest spec checks recall against
  * brute force, the codebook/encode invariants, and determinism.
  */
object Pq {

  import Similarity.dot

  /** One codebook per subspace: Lloyd's on the sliced sub-vectors with
    * the same deterministic seeding as IVF (the `ksub` lowest-id rows of
    * each subspace).
    *
    * All `m` subspaces train JOINTLY: the corpus explodes once into
    * (subspace, sub-vector) rows and every Lloyd round is ONE assignment
    * job + ONE mean aggregation over all subspaces — `iters` corpus
    * scans total, not `m · iters` (the per-subspace-sequential layout
    * would rescan a 100 TB corpus m times per round). */
  def trainCodebooks(embeddings: DataFrame, m: Int, ksub: Int, iters: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[(Int, Seq[Double])]] = {
    val dimRow = embeddings.select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty) return Seq.empty
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val w = dim / m
    val v = col(vecCol).cast("array<double>")
    val subs = embeddings.select(col(idCol).as("id"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), slice(v, s * w + 1, w).as("sub"))): _*)).as("x"))
      .select(col("id"), col("x.s").as("s"), col("x.sub").as("sub"))
      .pinCheckpoint() // scanned once per round; flat lineage across rounds
    // seeds are the ksub lowest-id documents' sub-vectors — the same set
    // for every subspace, so ONE no-shuffle TakeOrdered over the original
    // table (sliced driver-side) replaces a corpus-wide window sorted on
    // m skewed partitions
    val seedRows = embeddings.select(col(idCol).as("id"), v.as("vec"))
      .orderBy("id").limit(ksub).collect()
    var books: Map[Int, Seq[(Int, Seq[Double])]] = (0 until m).map { s =>
      s -> seedRows.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Double](1).slice(s * w, s * w + w)) }.toSeq
    }.toMap
    for (_ <- 0 until iters) {
      // per-subspace argmin, dispatched on the subspace id in one pass
      val cell = (0 until m).map(s => (s, Ivf.cellOf(col("sub"), books(s))))
        .foldLeft(lit(null).cast("int")) { case (els, (s, e)) =>
          when(col("s") === s, e).otherwise(els) }
      // ONE shuffle per round: the (s, cell, pos) mean aggregation. The
      // result is m·ksub·w rows — the size of the codebooks themselves,
      // driver-sized by construction — so the centroid arrays assemble
      // driver-side instead of through a second collect_list shuffle.
      val meanRows = subs.withColumn("cell", cell)
        .select(col("s"), col("cell"), posexplode(col("sub")))
        .groupBy("s", "cell", "pos").agg(avg(col("col")).as("mv"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
      val byCell: Map[(Int, Int), Seq[Double]] = meanRows.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1).map(_._2).toSeq }
      // empty cells keep their previous centroid
      books = books.map { case (s, cents) =>
        s -> cents.map { case (cid, c) => (cid, byCell.getOrElse((s, cid), c)) }
      }
    }
    (0 until m).map(books)
  }

  /** The compressed corpus: (id, codes) with one nearest-centroid code per
    * subspace — a per-row argmin through the codegen'd dot product, no
    * shuffle. */
  def encode(embeddings: DataFrame, codebooks: Seq[Seq[(Int, Seq[Double])]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.size
    val v = col(vecCol).cast("array<double>")
    val w = codebooks.head.head._2.size
    val codes = array(codebooks.zipWithIndex.map { case (cents, s) =>
      Ivf.cellOf(slice(v, s * w + 1, w), cents)
    }: _*)
    embeddings.select(col(idCol), codes.as("codes"))
  }

  // ---- integer-snapped (cross-engine exact) PQ ------------------------
  //
  // Same contract as Ivf's snapped k-means: quantize once up front
  // (w_d = floor(x_d * 1e6) + 8e6), train the per-subspace codebooks in
  // exact BIGINT Lloyd rounds (the shift keeps the round-half-up mean
  // snap on non-negative operands), and score ADC in the UNSHIFTED
  // integer space (u = w − 8e6): encode argmins are shift-invariant
  // (constant offsets cancel in squared distances), while dot products
  // are not — scoring must subtract the shift or every cosine collapses
  // toward 1. All sums stay below 2^53 under the requireExactBound
  // domain, so adot / (√n2q · √n2a) is a deterministic double any engine
  // reproduces bit-for-bit. Quantization at 1e-6 is the operator's
  // DEFINED metric (the data's own float32 noise floor), not an
  // approximation of the float path.

  /** Per-subspace codebooks in snapped-integer Lloyd rounds — the
    * cross-engine-exact twin of [[trainCodebooks]]; identical joint
    * training shape (one assignment job + one mean aggregation per round
    * across all m subspaces). */
  private[ext] def trainCodebooksSnapped(embeddings: DataFrame, m: Int, ksub: Int, iters: Int,
                                         idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[(Int, Seq[Long])]] = {
    val dimRow = embeddings.select(size(col(vecCol))).head(1)
    if (dimRow.isEmpty) return Seq.empty
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val w = dim / m
    val snapped = Ivf.snapVec(col(vecCol))
    val subs = embeddings.select(col(idCol).as("id"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), slice(snapped, s * w + 1, w).as("sub"))): _*)).as("x"))
      .select(col("id"), col("x.s").as("s"), col("x.sub").as("sub"))
      .pinCheckpoint()
    Ivf.requireExactBound(subs.select(col("sub").as("w")))
    val seedRows = embeddings.select(col(idCol).as("id"), snapped.as("wv"))
      .orderBy("id").limit(ksub).collect()
    var books: Map[Int, Seq[(Int, Seq[Long])]] = (0 until m).map { s =>
      s -> seedRows.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Double](1).slice(s * w, s * w + w).map(_.toLong).toSeq) }.toSeq
    }.toMap
    for (_ <- 0 until iters) {
      val cell = (0 until m).map(s => (s, Ivf.cellOfSnapped(col("sub"), books(s))))
        .foldLeft(lit(null).cast("int")) { case (els, (s, e)) =>
          when(col("s") === s, e).otherwise(els) }
      val rows = subs.withColumn("cell", cell)
        .select(col("s"), col("cell"), posexplode(col("sub")))
        .groupBy("s", "cell", "pos")
        .agg(sum(col("col").cast("long")).as("sm"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          // driver-side round-half-up snap in overflow-checked ops —
          // identical to trainCentroidsSnapped's (2s + n) div (2n)
          val (sm, n) = (r.getLong(3), r.getLong(4))
          val c = Math.addExact(Math.multiplyExact(2L, sm), n) / (2 * n)
          ((r.getInt(0), r.getInt(1)), (r.getInt(2), c))
        }
      val byCell: Map[(Int, Int), Seq[Long]] = rows.groupBy(_._1)
        .map { case (key, vs) => key -> vs.map(_._2).sortBy(_._1).map(_._2).toSeq }
      books = books.map { case (s, cents) =>
        s -> cents.map { case (cid, c) => (cid, byCell.getOrElse((s, cid), c)) }
      }
    }
    org.apache.spark.sql.graft.bridge.freeCheckpoint(subs)
    (0 until m).map(books)
  }

  /** [[pqTopK]] on the snapped recipe: deterministic codebooks, encode,
    * and ADC scoring any engine replays exactly — exact-match gradeable
    * instead of rows-only, same compression and scan shape as pqTopK. */
  def pqTopKSnapped(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
                    m: Int = 4, ksub: Int = 16, iters: Int = 5,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val books = trainCodebooksSnapped(embeddings, m, ksub, iters, idCol, vecCol)
    if (books.isEmpty) // empty corpus: empty result with the right shape
      return Similarity.emptyTopK(spark)
    val w = books.head.head._2.size
    val shift = Ivf.SnapShift
    val snapped = Ivf.snapVec(col(vecCol))
    val codes = array(books.zipWithIndex.map { case (cents, s) =>
      Ivf.cellOfSnapped(slice(snapped, s * w + 1, w), cents)
    }: _*)
    val coded = embeddings.select(col(idCol).as("neighbor_id"), codes.as("codes"))
    // unshifted reconstruction norms: query-independent plan literal
    val n2tab: Seq[Seq[Double]] = books.map(_.sortBy(_._1).map(_._2.map { x =>
      val u = x - shift; u * u }.sum.toDouble))
    // per-query ADC tables in unshifted integer space, driver-side
    val qdf = embeddings.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol), snapped).collect()
      .map { r =>
        val qid = r.getLong(0)
        val uq = r.getSeq[Double](1).map(x => x.toLong - shift)
        val tables: Seq[Seq[Double]] = books.zipWithIndex.map { case (cents, s) =>
          val qs = uq.slice(s * w, (s + 1) * w)
          cents.sortBy(_._1).map { case (_, c) =>
            qs.zip(c).map { case (a, b) => a * (b - shift) }.sum.toDouble }
        }
        (qid, tables, uq.map(u => u * u).sum.toDouble)
      }.toSeq.toDF("query_id", "tables", "n2_query")
    def lookupSum(tabs: Column): Column =
      aggregate(zip_with(col("codes"), tabs, (code, tab) => element_at(tab, code + 1)),
        lit(0.0d), _ + _)
    val scored = coded.withColumn("n2a", lookupSum(typedLit(n2tab)))
      .crossJoin(broadcast(qdf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adot", lookupSum(col("tables")))
      .select(col("query_id"), col("neighbor_id"),
        (col("adot") / (sqrt(col("n2_query")) * sqrt(col("n2a")))).as("score"))
    Similarity.topKPerQuery(scored, k)
  }

  /** PQ-ADC top-k: approximate cosine from table lookups —
    * dot(q, x̃) = Σ_s table_q[s][code_s] and ‖x̃‖² = Σ_s ‖c_{s,code_s}‖²,
    * where x̃ is the reconstruction of x from its codes. */
  def pqTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
             m: Int = 4, ksub: Int = 16, iters: Int = 5,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val books = trainCodebooks(embeddings, m, ksub, iters, idCol, vecCol)
    if (books.isEmpty) // empty corpus: empty result with the right shape
      return Similarity.emptyTopK(spark)
    val w = books.head.head._2.size
    val coded = encode(embeddings, books, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
    // reconstruction norms are query-independent: a plan literal
    val n2tab: Seq[Seq[Double]] =
      books.map(_.sortBy(_._1).map(_._2.map(x => x * x).sum))
    // per-query ADC tables, built driver-side from the driver-sized
    // codebooks and the (small, broadcast) query set
    val qdf = embeddings.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol), col(vecCol).cast("array<double>")).collect()
      .map { r =>
        val (qid, qv) = (r.getLong(0), r.getSeq[Double](1))
        val tables = books.zipWithIndex.map { case (cents, s) =>
          val qs = qv.slice(s * w, (s + 1) * w)
          cents.sortBy(_._1).map { case (_, c) =>
            qs.zip(c).map { case (a, b) => a * b }.sum }
        }
        (qid, tables, qv.map(x => x * x).sum)
      }.toSeq.toDF("query_id", "tables", "n2_query")
    def lookupSum(tabs: Column): Column =
      aggregate(zip_with(col("codes"), tabs, (code, tab) => element_at(tab, code + 1)),
        lit(0.0d), _ + _)
    // n2a depends only on the codes — compute it once per corpus row
    // BEFORE the query crossJoin, not |Q| times after
    val scored = coded.withColumn("n2a", lookupSum(typedLit(n2tab)))
      .crossJoin(broadcast(qdf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adot", lookupSum(col("tables")))
      .select(col("query_id"), col("neighbor_id"),
        (col("adot") / (sqrt(col("n2_query")) * sqrt(col("n2a")))).as("score"))
    Similarity.topKPerQuery(scored, k)
  }
}
