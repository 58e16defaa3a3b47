package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches with ENGINE-SPECIFIED hashes.
  *
  * Spark's built-in sketches (`approx_count_distinct`,
  * `count_min_sketch`, `approx_percentile`) are graded rows-only: their
  * internal hash functions and memory layouts are implementation details
  * no other engine reproduces. This module implements the same sketch
  * ALGORITHMS over hashes that are part of the operator's contract —
  * integer arithmetic any engine can replay — so the sketch state and the
  * estimate are hash-graded like every exact query, while keeping the
  * properties that make sketches the right tool at 100 TB: fixed memory,
  * one pass, and a commutative/associative merge (`max` per register
  * here), which Spark exploits as a map-side partial aggregate — register
  * maxes combine per partition and only m-row sketch states cross the
  * shuffle, never keys.
  */
object Sketches {

  /** Registers (2^6) in the HLL sketch; standard error ≈ 1.04/√64 ≈ 13%. */
  val HllM = 64

  /** Bias-correction constant α_64 = 0.7213 / (1 + 1.079/m). */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  /** The contract hash, staged onto the frame as `__h`: a 31-bit
    * multiply–xorshift–multiply–xorshift finalizer (murmur-finalizer
    * shape, kept under 63 bits so no engine overflows). One
    * multiplicative round is NOT enough: its low bits have periodic
    * structure on sequential keys, the trailing-zero ranks stop being
    * geometric, and the estimate lands ~2× high (measured 3943 for 2000
    * true distinct; the finalizer gives 1916). Low 6 bits pick the
    * register; the remaining 25 bits feed the rank. */
  private def withHash31(df: DataFrame, keyCol: String): DataFrame =
    df
      .withColumn("__h0", (col(keyCol).cast("long") * lit(2654435761L)) % lit(2147483648L))
      .withColumn("__h1", col("__h0").bitwiseXOR(expr("__h0 div 65536")))
      .withColumn("__h2", (col("__h1") * lit(2246822519L)) % lit(2147483648L))
      .withColumn("__h", col("__h2").bitwiseXOR(expr("__h2 div 8192")))

  /** ρ(w): position of the lowest set bit of the 25-bit `w`, 1-based;
    * 26 for w = 0 (all bits clear). Pure integer bit arithmetic —
    * `w AND -w` isolates the lowest set bit — because the tempting
    * `floor(log2(w))` runs through doubles whose rounding differs
    * across engines at power-of-two edges. */
  private def rank25(w: Column): Column =
    (0 until 25).foldLeft(when(w === 0L, lit(26L))) { (acc, r) =>
      acc.when(w.bitwiseAND(-w) === (1L << r), lit(r + 1L))
    }.otherwise(lit(-1L)) // unreachable: some bit of a non-zero w is set

  /** HyperLogLog distinct-count per group, fully graded: per-group
    * register vector (CSV, like the quantizer's codes), the exact
    * integer power sum S = Σ_j 2^(26 − r_j) (the estimator's denominator
    * over the common denominator 2^26), the scaled estimate
    * `round(α·m²·2^26 / S · 100)`, and the exact distinct count beside
    * it so the sketch's error is visible in the graded output itself.
    *
    * Empty registers count as rank 0 (contributing 2^26 to S) — realized
    * by a grid join over all m registers, so groups that touch few
    * registers still produce the full-width sketch state a merge needs. */
  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val hashed = withHash31(df, keyCol)
    val reg = (col("__h") % HllM).as("register")
    val w = expr(s"__h div $HllM")
    val ranked = hashed.select(col(groupCol), reg, rank25(w).as("rank"))
    val regMax = ranked.groupBy(col(groupCol), col("register"))
      .agg(max(col("rank")).as("max_rank"))
    // full m-register grid per group: absent registers carry rank 0
    val grid = df.select(col(groupCol)).distinct()
      .select(col(groupCol), explode(sequence(lit(0L), lit(HllM - 1L))).as("register"))
    val full = grid.join(regMax, Seq(groupCol, "register"), "left_outer")
      .withColumn("r", coalesce(col("max_rank"), lit(0L)))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_distinct_exact"))
    full.groupBy(col(groupCol))
      .agg(
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("register"), col("r")))),
            x => x.getField("r").cast("string"))).as("registers_csv"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - r AS INT))")).as("pow_sum"))
      .join(exact, groupCol)
      .withColumn("est_scaled",
        round(lit(HllAlpha * HllM * HllM * (1L << 26).toDouble) /
          col("pow_sum").cast("double") * 100.0).cast("long"))
      .select(col(groupCol), col("registers_csv"), col("pow_sum"),
        col("est_scaled"), col("n_distinct_exact"))
      .orderBy(groupCol)
  }

  /** HLL MERGEABILITY under grade — the property that makes sketches
    * worth having at 100 TB: every partition/group sketches
    * independently, and register-wise max merges the states losslessly.
    * This computes the per-group sketch states (exactly
    * [[hllDistinct]]'s), merges them by register-wise max, estimates —
    * and carries the DIRECT whole-table estimate beside it. The graded
    * claim is merged == direct, row-identical: the oracle derives the
    * single-pass sketch only, so any lossy merge hash-mismatches. */
  def hllMerged(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val hashed = withHash31(df, keyCol)
    val perGroup = hashed
      .select(col(groupCol), (col("__h") % HllM).as("register"),
        rank25(expr(s"__h div $HllM")).as("rank"))
      .groupBy(col(groupCol), col("register")).agg(max(col("rank")).as("r"))
    val merged = perGroup.groupBy(col("register")).agg(max(col("r")).as("r"))
    val grid = df.sparkSession.range(HllM).select(col("id").as("register"))
    val full = grid.join(merged, Seq("register"), "left")
      .withColumn("r", coalesce(col("r"), lit(0L)))
    val mergedAgg = full.agg(
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("register"), col("r")))),
            x => x.getField("r").cast("string"))).as("registers_csv"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - r AS INT))")).as("pow_sum"))
      .withColumn("est_scaled",
        round(lit(HllAlpha * HllM * HllM * (1L << 26).toDouble) /
          col("pow_sum").cast("double") * 100.0).cast("long"))
    val direct = hllDistinct(df.withColumn("__all", lit("all")), "__all", keyCol)
      .select(col("est_scaled").as("est_direct_scaled"))
    val stats = df.agg(countDistinct(col(groupCol)).as("n_groups"),
      countDistinct(col(keyCol)).as("n_distinct_exact"))
    mergedAgg.crossJoin(broadcast(direct)).crossJoin(broadcast(stats))
      .select(col("registers_csv"), col("pow_sum"), col("est_scaled"),
        col("est_direct_scaled"), col("n_groups"), col("n_distinct_exact"))
  }

  /** Inclusion–exclusion set-intersection estimate from two HLL
    * sketches — sketch algebra's answer to "how much do these two
    * slices overlap" without rescanning either side:
    * `est∩ = est_A + est_B − est_∪`, where the union sketch is the
    * LOSSLESS register-wise max of the two states (the same merge
    * [[hllMerged]] grades). The subtraction compounds both sketches'
    * errors — small overlaps can even estimate negative — which is why
    * the exact intersection count rides in the graded row beside it.
    * One row: the three pow sums, the three estimates, the
    * inclusion–exclusion intersection estimate, and the exact count. */
  def hllIntersect(df: DataFrame, keyCol: String,
                   predA: org.apache.spark.sql.Column,
                   predB: org.apache.spark.sql.Column): DataFrame = {
    val hashed = withHash31(df, keyCol)
    val perSet = hashed.filter(predA).withColumn("__set", lit("a"))
      .unionByName(hashed.filter(predB).withColumn("__set", lit("b")))
      .select(col("__set"), (col("__h") % HllM).as("register"),
        rank25(expr(s"__h div $HllM")).as("rank"))
      .groupBy(col("__set"), col("register")).agg(max(col("rank")).as("r"))
      .localCheckpoint(true) // feeds three sketch folds
    val grid = df.sparkSession.range(HllM).select(col("id").as("register"))
    def powSum(regs: DataFrame, out: String): DataFrame =
      grid.join(regs, Seq("register"), "left")
        .withColumn("r", coalesce(col("r"), lit(0L)))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - r AS INT))")).as(out))
    val pa = powSum(perSet.filter(col("__set") === "a").select("register", "r"), "pow_sum_a")
    val pb = powSum(perSet.filter(col("__set") === "b").select("register", "r"), "pow_sum_b")
    val pu = powSum(perSet.groupBy(col("register")).agg(max(col("r")).as("r")), "pow_sum_u")
    val exact = df.filter(predA).select(col(keyCol)).distinct()
      .join(df.filter(predB).select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .agg(count(lit(1)).as("n_intersect_exact"))
    def est(c: org.apache.spark.sql.Column) =
      round(lit(HllAlpha * HllM * HllM * (1L << 26).toDouble) /
        c.cast("double") * 100.0).cast("long")
    pa.crossJoin(pb).crossJoin(pu).crossJoin(broadcast(exact))
      .select(col("pow_sum_a"), col("pow_sum_b"), col("pow_sum_u"),
        est(col("pow_sum_a")).as("est_a_scaled"),
        est(col("pow_sum_b")).as("est_b_scaled"),
        est(col("pow_sum_u")).as("est_union_scaled"),
        (est(col("pow_sum_a")) + est(col("pow_sum_b"))
          - est(col("pow_sum_u"))).as("est_intersect_scaled"),
        col("n_intersect_exact"))
  }

  // ---------------------------------------------------------------------
  // Count-min sketch with contract hashes
  // ---------------------------------------------------------------------

  /** CMS depth (hash rows) and width (cells per row): ε ≈ e/w ≈ 1%,
    * δ ≈ e^-d ≈ 2%. */
  val CmsD = 4
  val CmsW = 256

  /** Per-row pre-multipliers making the d hash rows independent. */
  val CmsRowMults: Seq[Long] = Seq(3L, 40503L, 2654435761L, 2246822519L)

  /** The 31-bit xorshift finalizer as SQL over a column expression
    * (shared shape with [[withHash31]]'s staged form). */
  private def finalize31Sql(v: String): String = {
    val a = s"(($v) ^ (($v) div 65536))"
    val b = s"(($a * 2246822519L) % 2147483648L)"
    s"($b ^ ($b div 8192))"
  }

  /** Horner character hash of `word` into 31 bits (the hashingTf fold,
    * modulus swapped for 2^31 so it feeds the finalizer). */
  private val hornerSql: String =
    """aggregate(transform(sequence(1, length(word)), i -> ascii(substr(word, i, 1))),
      |CAST(0 AS BIGINT), (a, c) -> (a * 31 + c) % 2147483648)""".stripMargin

  /** Count-min sketch over the token stream, fully graded: build the
    * d×w counter table (cell-wise sums — a commutative merge Spark runs
    * as a map-side partial aggregate, so only ≤ d·w counter rows cross
    * the shuffle), then probe it with the corpus's top-k exact tokens
    * and report the CMS estimate beside the true count. The sketch's
    * defining one-sided guarantee — estimates NEVER undercount — is
    * visible row by row in the graded output (`over_count ≥ 0`).
    *
    * Row hashes: the shared Horner token hash, per-row multiplied and
    * xorshift-finalized (same avalanche rationale as the HLL hash). */
  def cmsTokenCounts(docs: DataFrame, topK: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    val tok = graft.text.Tokenize.tokenize(docs, "text", "doc_id")
      .filter(col("word") =!= "")
      .withColumn("hb", expr(hornerSql))
    val cells = tok.select(col("word"), col("hb"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("row"))
      .withColumn("mult",
        element_at(array(CmsRowMults.map(lit): _*), col("row") + 1))
      .withColumn("cell",
        expr(s"${finalize31Sql("(hb * mult) % 2147483648L")} % $CmsW"))
    val counters = cells.groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("n"))
    val exact = tok.groupBy(col("word")).agg(count(lit(1)).as("true_count"))
    val probes = exact
      .orderBy(col("true_count").desc, col("word"))
      .limit(topK)
      .withColumn("hb", expr(hornerSql))
      .select(col("word"), col("true_count"), col("hb"),
        explode(sequence(lit(0), lit(CmsD - 1))).as("row"))
      .withColumn("mult",
        element_at(array(CmsRowMults.map(lit): _*), col("row") + 1))
      .withColumn("cell",
        expr(s"${finalize31Sql("(hb * mult) % 2147483648L")} % $CmsW"))
    probes.join(broadcast(counters), Seq("row", "cell"))
      .groupBy(col("word"), col("true_count"))
      .agg(min(col("n")).as("cms_count"))
      .select(col("word"), col("cms_count"), col("true_count"),
        (col("cms_count") - col("true_count")).as("over_count"))
      .orderBy(col("true_count").desc, col("word"))
  }
}
