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
  /** The raw per-(group, register) rank maxima — the whole HLL state,
    * ≤ m rows per group. Shared by [[hllDistinct]] and the streaming
    * sketch-at-ingest fold (which collects the bounded state per
    * micro-batch and merges driver-side by the same register-wise max
    * the in-engine partial aggregate runs). */
  def hllRegisterMax(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val hashed = withHash31(df, keyCol)
    val reg = (col("__h") % HllM).as("register")
    val w = expr(s"__h div $HllM")
    hashed.select(col(groupCol), reg, rank25(w).as("rank"))
      .groupBy(col(groupCol), col("register"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** Project a (group, register, max_rank) state frame to the graded
    * sketch report, joining exact distinct counts from `df`. */
  def hllReportFromState(regMax: DataFrame, df: DataFrame,
                         groupCol: String, keyCol: String): DataFrame = {
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

  def hllDistinct(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    hllReportFromState(hllRegisterMax(df, groupCol, keyCol), df, groupCol, keyCol)

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
  // Level-sampling quantile sketch with a contract hash
  // ---------------------------------------------------------------------

  /** Kept-set capacity of the quantile sketch. Rank error is
    * O(N/√capacity) w.h.p. (the kept set is a uniform 2^-L sample with
    * N/2^L ∈ (capacity/2, capacity]); 1024 gives ~3% rank error. */
  val QsCapacity = 1024L

  /** The contract hash for the quantile sampler: the row id pre-folded
    * into 31 bits (so the multiply can never overflow a BIGINT under
    * ANSI mode, whatever the id magnitude), then the same
    * multiply–xorshift–multiply–xorshift finalizer as [[withHash31]]. */
  private def withSamplerHash(df: DataFrame, id: Column): DataFrame =
    df
      .withColumn("__i", pmod(id.cast("long"), lit(2147483648L)))
      .withColumn("__h0", (col("__i") * lit(2654435761L)) % lit(2147483648L))
      .withColumn("__h1", col("__h0").bitwiseXOR(expr("__h0 div 65536")))
      .withColumn("__h2", (col("__h1") * lit(2246822519L)) % lit(2147483648L))
      .withColumn("__h", col("__h2").bitwiseXOR(expr("__h2 div 8192")))

  /** Trailing-zero count of the 31-bit hash `h` (0-based; 31 for h = 0):
    * the item's sampling LEVEL — geometric, so level ≥ L keeps each row
    * with probability 2^-L. Branch-free integer form: `h AND -h`
    * isolates the lowest set bit (a power of two), and popcount of that
    * minus one IS the trailing-zero count — no doubles, no
    * engine-dependent log2 rounding, and codegen-friendly (the 31-case
    * CASE chain this replaces blew janino's method limit inside
    * micro-batch plans). */
  private def levelOf(h: Column): Column =
    when(h === 0L, lit(31L))
      .otherwise(bit_count(h.bitwiseAND(-h) - lit(1L)).cast("long"))

  /** Per-level histogram → the sampler cut: the smallest level L whose
    * kept count (rows with level ≥ L) is ≤ capacity. Because L is chosen
    * on the EXACT counts, the kept set is ≤ capacity rows by
    * construction — not in expectation. One-row frame `(qs_level)`. */
  private def samplerCut(leveled: DataFrame, capacity: Long): DataFrame = {
    val counts = leveled.groupBy(col("__lvl")).agg(count(lit(1)).as("__n"))
    val grid = leveled.sparkSession.range(0, 32).select(col("id").as("__L"))
    grid.join(counts, col("__lvl") >= col("__L"), "left_outer")
      .groupBy(col("__L")).agg(sum(coalesce(col("__n"), lit(0L))).as("__cum"))
      .filter(col("__cum") <= capacity)
      .agg(min(col("__L")).as("qs_level"))
  }

  /** Quantile sketch over `valueCol`, fully graded: one pass assigns
    * every row a hash-determined sampling level (trailing zeros of the
    * contract hash — geometric); the cut L is the smallest level whose
    * population fits `capacity`; the ≤ capacity kept rows each stand for
    * 2^L corpus rows, so the φ-quantile estimate is the kept value at
    * index ceil(target_rank / 2^L). Deterministic end to end — same
    * data, same sketch, any engine — which is what lets the estimate be
    * HASH-graded, unlike `approx_percentile`'s private internals.
    *
    * Scale shape: the level histogram is a ≤ 32-row aggregate; the kept
    * set is ≤ capacity rows (the one window below runs over that bounded
    * frame, never the corpus); the exact-rank probe of each estimate is
    * a broadcast of ≤ |quantiles| rows against one corpus scan. The
    * graded row carries the sketch state (level, kept count) and the
    * estimate's EXACT rank beside its target, so the sketch's rank error
    * is visible in the output itself — the same
    * estimate-next-to-truth convention as [[hllDistinct]]. */
  def quantileSketch(df: DataFrame, valueCol: String, idExpr: Column,
                     quantilesPct: Seq[Int] = Seq(25, 50, 75, 95),
                     capacity: Long = QsCapacity): DataFrame = {
    require(quantilesPct.nonEmpty && quantilesPct.forall(q => q >= 1 && q <= 100),
      "quantile percentages must lie in [1, 100]")
    val base = withSamplerHash(
        df.select(col(valueCol).as("__v"), idExpr.as("__rid")), col("__rid"))
      .withColumn("__lvl", levelOf(col("__h")))
      .select(col("__v"), col("__i"), col("__lvl"))
    val cut = samplerCut(base, capacity)
    val kept = base.crossJoin(broadcast(cut))
      .filter(col("__lvl") >= col("qs_level"))
    // ≤ capacity rows: the index is a bounded-frame sort, not a corpus
    // window (ties broken by the hashed id for a total, engine-portable
    // order). Partitioned by the cut level — one value over the whole
    // kept set, so semantically identical to a global row_number — which
    // keeps WindowExec's moving-to-single-partition WARN out of the
    // logs: a warn-clean bench tail makes any future WindowExec WARN a
    // real regression signal.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qs_level"))
      .orderBy(col("__v"), col("__i"))
    val indexed = kept
      .select(col("__v"), col("__i"), col("qs_level"))
      .withColumn("__idx", row_number().over(w).cast("long"))
    val stats = df.agg(count(lit(1)).as("n_total"))
    val keptStats = indexed.groupBy(col("qs_level"))
      .agg(count(lit(1)).as("n_kept"))
    val qs = df.sparkSession.range(1)
      .select(explode(array(quantilesPct.map(q => lit(q.toLong)): _*)).as("q_pct"))
    // target rank and the kept index it maps to, all ceil-division in
    // integers: t = ceil(q·N/100), idx = min(ceil(t/2^L), n_kept)
    val targets = qs.crossJoin(broadcast(stats)).crossJoin(broadcast(keptStats))
      .withColumn("target_rank", expr("(q_pct * n_total + 99) div 100"))
      .withColumn("__w", expr("shiftleft(CAST(1 AS BIGINT), CAST(qs_level AS INT))"))
      .withColumn("est_idx",
        least(expr("(target_rank + __w - 1) div __w"), col("n_kept")))
    val ests = targets.join(broadcast(indexed.select(col("__idx"), col("__v"))),
        col("est_idx") === col("__idx"))
      .select(col("q_pct"), col("n_total"), col("qs_level").as("level"),
        col("n_kept"), col("target_rank"), col("est_idx"),
        col("__v").as("est_value"))
    // exact rank of each estimate: rows strictly below it, one corpus
    // scan against the broadcast ≤|quantiles|-row estimate frame
    df.select(col(valueCol).as("__cv")).crossJoin(broadcast(ests))
      .groupBy(col("q_pct"), col("n_total"), col("level"), col("n_kept"),
        col("target_rank"), col("est_idx"), col("est_value"))
      .agg((sum(when(col("__cv") < col("est_value"), 1L).otherwise(0L))
        + lit(1L)).as("est_rank"))
      .withColumn("rank_err", abs(col("est_rank") - col("target_rank")))
      .select(col("q_pct"), col("n_total"), col("level"), col("n_kept"),
        col("target_rank"), col("est_idx"), col("est_value"),
        col("est_rank"), col("rank_err"))
      .orderBy(col("q_pct"))
  }

  /** The sampler staging exposed for INCREMENTAL maintainers: hash,
    * trailing-zero level, fold to the (value, hashed id, level) frame. */
  def stageLeveled(df: DataFrame, valueCol: String, idExpr: Column): DataFrame =
    withSamplerHash(df.select(col(valueCol).as("__v"), idExpr.as("__rid")), col("__rid"))
      .withColumn("__lvl", levelOf(col("__h")))
      .select(col("__v"), col("__i"), col("__lvl"))

  /** Incremental re-cut: given the current kept state (complete at
    * levels ≥ `floorLevel`) unioned with a RAW staged batch (complete at
    * every level — a level-0 sketch), pick the smallest L ≥ floorLevel
    * whose population fits and filter to it. Because each micro-batch's
    * raw rows carry all levels and the state is complete above its own
    * floor, the union's counts at L ≥ floorLevel are the TRUE counts of
    * everything seen — so the maintained state equals the single-pass
    * sketch of the full stream at every step (the [[quantileSketchMerged]]
    * argument, applied per batch). The level histogram collected here is
    * ≤ 32 rows — driver-bounded like every codebook. */
  def recut(union: DataFrame, floorLevel: Long,
            capacity: Long = QsCapacity): (DataFrame, Long) = {
    val counts = union.groupBy(col("__lvl")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val level = (floorLevel to 31L)
      .find(l => (l to 31L).map(counts.getOrElse(_, 0L)).sum <= capacity)
      .getOrElse(32L)
    (union.filter(col("__lvl") >= level), level)
  }

  /** The graded report from MAINTAINED state (level and totals are
    * literals here, not frames): same columns, same integer arithmetic
    * as [[quantileSketch]] — a maintained state that equals the direct
    * sketch produces a bit-identical report. */
  def quantileReportFromState(kept: DataFrame, level: Long, nTotal: Long,
                              corpusVals: DataFrame,
                              quantilesPct: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    // bounded ≤ capacity rows; the constant partition key makes the
    // single partition EXPLICIT (no empty-partition-spec WindowExec
    // WARN — the bench tail stays warn-clean so a future WARN is
    // signal). pmod(__i, 1) is always 0 but NOT foldable, so the
    // optimizer cannot collapse the spec back to empty (a bare lit
    // constant-folds away and the WARN returns).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("__i"), lit(1L))).orderBy(col("__v"), col("__i"))
    val indexed = kept.select(col("__v"), col("__i"))
      .withColumn("__idx", row_number().over(w).cast("long"))
    val nKept = kept.count()
    val width = 1L << level.toInt
    val targets = quantilesPct.map { q =>
      val t = (q * nTotal + 99) / 100
      val idx = math.min((t + width - 1) / width, nKept)
      (q.toLong, t, idx)
    }
    val spark = kept.sparkSession
    import spark.implicits._
    val ests = targets.toDF("q_pct", "target_rank", "est_idx")
      .join(broadcast(indexed.select(col("__idx"), col("__v"))),
        col("est_idx") === col("__idx"))
      .select(col("q_pct"), lit(nTotal).as("n_total"), lit(level).as("level"),
        lit(nKept).as("n_kept"), col("target_rank"), col("est_idx"),
        col("__v").as("est_value"))
    corpusVals.crossJoin(broadcast(ests))
      .groupBy(col("q_pct"), col("n_total"), col("level"), col("n_kept"),
        col("target_rank"), col("est_idx"), col("est_value"))
      .agg((sum(when(col("__cv") < col("est_value"), 1L).otherwise(0L))
        + lit(1L)).as("est_rank"))
      .withColumn("rank_err", abs(col("est_rank") - col("target_rank")))
      .select(col("q_pct"), col("n_total"), col("level"), col("n_kept"),
        col("target_rank"), col("est_idx"), col("est_value"),
        col("est_rank"), col("rank_err"))
      .orderBy(col("q_pct"))
  }

  /** Per-GROUP quantile sketch — the production shape: one pass over
    * the corpus sketches every group simultaneously. Same contract
    * sampler as [[quantileSketch]], but the cut is chosen PER GROUP
    * (each group's kept set is ≤ capacity rows by construction), the
    * kept-frame sort runs under `Window.partitionBy(group)` — bounded
    * per group, distributed across groups, never a SinglePartition — and
    * the exact-rank probe is a group-keyed equi-join (≤ |groups|·|q|
    * estimate rows against one corpus scan). Graded row per
    * (group, quantile), the same estimate-next-to-truth convention. */
  def quantileSketchGrouped(df: DataFrame, groupCol: String, valueCol: String,
                            idExpr: Column,
                            quantilesPct: Seq[Int] = Seq(25, 50, 75, 95),
                            capacity: Long = QsCapacity): DataFrame = {
    require(quantilesPct.nonEmpty && quantilesPct.forall(q => q >= 1 && q <= 100),
      "quantile percentages must lie in [1, 100]")
    val base = withSamplerHash(
        df.select(col(groupCol).as("grp"), col(valueCol).as("__v"),
          idExpr.as("__rid")), col("__rid"))
      .withColumn("__lvl", levelOf(col("__h")))
      .select(col("grp"), col("__v"), col("__i"), col("__lvl"))
    val counts = base.groupBy(col("grp"), col("__lvl")).agg(count(lit(1)).as("__n"))
    val grid = df.select(col(groupCol).as("grp")).distinct()
      .select(col("grp"), explode(sequence(lit(0L), lit(31L))).as("__L"))
    val cut = grid.join(counts,
        grid("grp") === counts("grp") && col("__lvl") >= col("__L"), "left_outer")
      .select(grid("grp"), col("__L"), col("__n"))
      .groupBy(col("grp"), col("__L")).agg(sum(coalesce(col("__n"), lit(0L))).as("__cum"))
      .filter(col("__cum") <= capacity)
      .groupBy(col("grp")).agg(min(col("__L")).as("qs_level"))
    val kept = base.join(cut, "grp").filter(col("__lvl") >= col("qs_level"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("__v"), col("__i"))
    val indexed = kept.select(col("grp"), col("__v"), col("__i"))
      .withColumn("__idx", row_number().over(w).cast("long"))
    val nt = df.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("n_total"))
    val nk = kept.groupBy(col("grp")).agg(count(lit(1)).as("n_kept"))
    val qs = df.sparkSession.range(1)
      .select(explode(array(quantilesPct.map(q => lit(q.toLong)): _*)).as("q_pct"))
    val targets = nt.join(nk, "grp").join(cut, "grp").crossJoin(broadcast(qs))
      .withColumn("target_rank", expr("(q_pct * n_total + 99) div 100"))
      .withColumn("__w", expr("shiftleft(CAST(1 AS BIGINT), CAST(qs_level AS INT))"))
      .withColumn("est_idx",
        least(expr("(target_rank + __w - 1) div __w"), col("n_kept")))
    val ests = targets.join(indexed.select(col("grp"), col("__idx"), col("__v")),
        targets("grp") === indexed("grp") && col("est_idx") === col("__idx"))
      .select(targets("grp"), col("q_pct"), col("n_total"),
        col("qs_level").as("level"), col("n_kept"), col("target_rank"),
        col("est_idx"), col("__v").as("est_value"))
    df.select(col(groupCol).as("grp"), col(valueCol).as("__cv"))
      .join(broadcast(ests), "grp")
      .groupBy(col("grp"), col("q_pct"), col("n_total"), col("level"),
        col("n_kept"), col("target_rank"), col("est_idx"), col("est_value"))
      .agg((sum(when(col("__cv") < col("est_value"), 1L).otherwise(0L))
        + lit(1L)).as("est_rank"))
      .withColumn("rank_err", abs(col("est_rank") - col("target_rank")))
      .select(col("grp").as(groupCol), col("q_pct"), col("n_total"), col("level"),
        col("n_kept"), col("target_rank"), col("est_idx"), col("est_value"),
        col("est_rank"), col("rank_err"))
      .orderBy(col(groupCol), col("q_pct"))
  }

  /** Quantile-sketch MERGEABILITY under grade, the [[hllMerged]]
    * convention: sketch two disjoint halves of the corpus independently
    * (id parity), merge by unioning the kept sets and re-cutting at the
    * smallest L ≥ max(L_a, L_b) whose union population fits — and emit
    * the merged state beside the direct whole-corpus state. The merge is
    * provably LOSSLESS: each half's cut L_g ≤ the direct cut L_d (half
    * counts never exceed whole counts), so the union holds every corpus
    * row at level ≥ L_d and the re-cut lands exactly on the direct kept
    * set. The oracle derives the single-pass direct sketch only and
    * emits it as both column families — any lossy merge hash-mismatches. */
  def quantileSketchMerged(df: DataFrame, valueCol: String, idExpr: Column,
                           capacity: Long = QsCapacity): DataFrame = {
    val base = withSamplerHash(
        df.select(col(valueCol).as("__v"), idExpr.as("__rid")), col("__rid"))
      .withColumn("__lvl", levelOf(col("__h")))
      .select(col("__v"), col("__i"), col("__lvl"))
      .withColumn("__half", pmod(col("__i"), lit(2L)))
      .localCheckpoint(true) // feeds both half sketches and the direct one
    def cutOf(d: DataFrame): DataFrame = samplerCut(d, capacity)
    val keptHalf = (h: Int) => {
      val half = base.filter(col("__half") === h.toLong)
      half.crossJoin(broadcast(cutOf(half).select(col("qs_level").as("__Lg"))))
        .filter(col("__lvl") >= col("__Lg"))
        .select(col("__v"), col("__i"), col("__lvl"), col("__Lg"))
    }
    val unioned = keptHalf(0).unionByName(keptHalf(1))
    // re-cut over the union, constrained to L ≥ max(L_a, L_b): union
    // level counts below that floor are incomplete by construction
    val floorL = unioned.agg(max(col("__Lg")).as("__floor"))
    val unionCounts = unioned.groupBy(col("__lvl")).agg(count(lit(1)).as("__n"))
    val grid = df.sparkSession.range(0, 32).select(col("id").as("__L"))
    val mergedCut = grid.crossJoin(broadcast(floorL))
      .filter(col("__L") >= col("__floor"))
      .join(unionCounts, col("__lvl") >= col("__L"), "left_outer")
      .groupBy(col("__L")).agg(sum(coalesce(col("__n"), lit(0L))).as("__cum"))
      .filter(col("__cum") <= capacity)
      .agg(min(col("__L")).as("level_merged"))
    // double sums are accumulation-order dependent — the checksum goes
    // through DECIMAL(18,2) (exact for 2-decimal prices) on both engines
    def summarize(kept: DataFrame, suffix: String): DataFrame =
      kept.agg(count(lit(1)).as(s"n_kept_$suffix"),
        sum(col("__v").cast("decimal(18,2)")).as(s"sum_v_$suffix"),
        min(col("__v")).as(s"min_v_$suffix"),
        max(col("__v")).as(s"max_v_$suffix"))
    val merged = unioned.crossJoin(broadcast(mergedCut))
      .filter(col("__lvl") >= col("level_merged"))
    val directCut = cutOf(base)
    val direct = base.crossJoin(broadcast(directCut))
      .filter(col("__lvl") >= col("qs_level"))
    mergedCut.crossJoin(broadcast(summarize(merged, "merged")))
      .crossJoin(broadcast(directCut.select(col("qs_level").as("level_direct"))))
      .crossJoin(broadcast(summarize(direct, "direct")))
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

  /** CMS counter state over numeric-key OCCURRENCES (the contract-hash
    * sibling of [[cmsTokenCounts]]'s counter build): (row, cell, n) —
    * bounded d × w whatever the row count. Counter states merge by
    * per-cell SUM: count sketches add losslessly, so per-batch states
    * folded with + equal the single-pass table. */
  def cmsState(df: DataFrame, keyCol: String): DataFrame =
    withHash31(df.select(col(keyCol)), keyCol)
      .withColumn("row", explode(sequence(lit(0), lit(CmsD - 1))))
      .withColumn("mult", element_at(array(CmsRowMults.map(lit): _*), col("row") + 1))
      .withColumn("cell",
        expr(s"${finalize31Sql("(__h * mult) % 2147483648L")} % $CmsW"))
      .groupBy(col("row"), col("cell")).agg(count(lit(1)).as("n"))

  /** Probe a counter state with the top-K keys by exact occurrence
    * count: (key, cms_count, true_count, over_count) — the
    * never-undercount guarantee visible per row. */
  def cmsReportFromState(state: DataFrame, df: DataFrame, keyCol: String,
                         topK: Int = 20): DataFrame = {
    val exact = df.select(col(keyCol).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("true_count"))
    val probes = exact.orderBy(col("true_count").desc, col("key")).limit(topK)
    val pcells = withHash31(probes, "key")
      .withColumn("row", explode(sequence(lit(0), lit(CmsD - 1))))
      .withColumn("mult", element_at(array(CmsRowMults.map(lit): _*), col("row") + 1))
      .withColumn("cell",
        expr(s"${finalize31Sql("(__h * mult) % 2147483648L")} % $CmsW"))
    pcells.join(broadcast(state), Seq("row", "cell"))
      .groupBy(col("key"), col("true_count"))
      .agg(min(col("n")).as("cms_count"))
      .select(col("key"), col("cms_count"), col("true_count"),
        (col("cms_count") - col("true_count")).as("over_count"))
      .orderBy(col("true_count").desc, col("key"))
  }

  // ---------------------------------------------------------------------
  // Bloom filter with CONTRACT hashes: graded membership screening
  // ---------------------------------------------------------------------

  /** Bloom bits (2^14) and hash count; at the fixture's load the FP
    * rate is a visible double-digit percentage — the point of grading
    * `is_fp` rows is that the sketch's one-sided error is ON DISPLAY. */
  val BloomM = 16384
  val BloomD = 3
  val BloomMults: Seq[Long] = Seq(2654435761L, 40503L, 2246822519L)

  private def bloomPositions(df: DataFrame, keyCol: String): DataFrame =
    withHash31(df, keyCol)
      .withColumn("d", explode(sequence(lit(0), lit(BloomD - 1))))
      .withColumn("mult", element_at(array(BloomMults.map(lit): _*), col("d") + 1))
      .withColumn("bit",
        expr(s"${finalize31Sql("(__h * mult) % 2147483648L")} % $BloomM"))

  /** Contract-hash Bloom membership screen — the routing sketch behind
    * [[Incremental]]'s native-bloom ingest, here with ENGINE-SPECIFIED
    * bit positions so the filter state and every verdict hash-grade:
    * slice A's distinct keys set d=3 finalized bits each; `probes`-many
    * smallest distinct slice-B keys are then screened. Per probe:
    * (key, might_contain, in_a, is_fp) — no-false-negative is visible
    * per row (in_a ⇒ might_contain), false positives are COUNTED — plus
    * the filter's bit population and A's distinct count broadcast along.
    *
    * Scale shape: bit-set build is one distinct aggregation on ≤ m
    * values (the partial-agg union IS the bloom merge); probes join the
    * ≤ m-row bit set on the bit index — keys never cross the shuffle. */
  def bloomScreen(df: DataFrame, keyCol: String,
                  predA: Column, predB: Column, probes: Int = 50): DataFrame = {
    val bits = bloomPositions(df.filter(predA), keyCol)
      .select(col("bit")).distinct()
    val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
    val aKeys = df.filter(predA).select(col(keyCol).as("key")).distinct()
    val nA = aKeys.agg(count(lit(1)).as("n_a_distinct"))
    val probeKeys = df.filter(predB).select(col(keyCol).as("key")).distinct()
      .orderBy("key").limit(probes)
    val hits = bloomPositions(probeKeys, "key")
      .join(bits, Seq("bit"), "left_semi")
      .groupBy(col("key")).agg(count(lit(1)).as("__hits"))
    probeKeys
      .join(hits, Seq("key"), "left_outer")
      .withColumn("might_contain", coalesce(col("__hits"), lit(0L)) === BloomD)
      .join(aKeys.withColumn("in_a", lit(true)), Seq("key"), "left_outer")
      .withColumn("in_a", coalesce(col("in_a"), lit(false)))
      .withColumn("is_fp", col("might_contain") && !col("in_a"))
      .select(col("key"), col("might_contain"), col("in_a"), col("is_fp"))
      .crossJoin(broadcast(nBits)).crossJoin(broadcast(nA))
      .orderBy("key")
  }

  /** Per-group Bloom bit state ([[bloomPositions]], grouped): the
    * DISTINCT (group, bit) pairs — bounded by groups × m whatever the
    * row count; the distinct aggregation's partial-agg union IS the
    * bloom merge, so per-batch states OR together losslessly. */
  def bloomBitsState(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    bloomPositions(df.select(col(groupCol), col(keyCol)), keyCol)
      .select(col(groupCol), col("bit")).distinct()

  /** Project (group, bit) states to the graded per-group report —
    * population + the integer Σ bit² checksum (any dropped or phantom
    * bit hash-mismatches) — with exact distinct counts joined from
    * `df` so the filter's load is visible in the graded row. */
  def bloomReportFromState(state: DataFrame, df: DataFrame,
                           groupCol: String, keyCol: String): DataFrame = {
    val stats = state.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_bits_set"),
        sum(col("bit") * col("bit")).as("bits_checksum"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_distinct_exact"))
    stats.join(exact, groupCol)
      .select(col(groupCol), col("n_bits_set"), col("bits_checksum"),
        col("n_distinct_exact"))
      .orderBy(groupCol)
  }

  /** Bloom MERGEABILITY under grade, the [[hllMerged]]/[[thetaMerged]]
    * convention: each `subCol` slice of the A-side builds its own
    * distinct-bit state; the merge is the bitwise OR (set union of bit
    * indexes) — provably lossless — and the graded one-row report
    * carries the merged state's population and an integer bit-set
    * checksum `Σ bit²` the oracle derives from the DIRECT single-pass
    * filter only, so any lossy merge (intersection, re-hash, dropped
    * slice) hash-mismatches. */
  def bloomMerged(df: DataFrame, keyCol: String, subCol: String,
                  predA: Column): DataFrame = {
    val a = df.filter(predA)
    val perSub = bloomPositions(a, keyCol)
      .select(col(subCol), col("bit")).distinct()
    val merged = perSub.select(col("bit")).distinct()
    val stats = merged.agg(count(lit(1)).as("n_bits_set"),
      sum(col("bit") * col("bit")).as("bits_checksum"))
    val subs = a.agg(countDistinct(col(subCol)).as("n_subsets"),
      countDistinct(col(keyCol)).as("n_a_distinct"))
    stats.crossJoin(broadcast(subs))
      .select(col("n_subsets"), col("n_bits_set"), col("bits_checksum"),
        col("n_a_distinct"))
  }

  // ---------------------------------------------------------------------
  // KMV ("theta") distinct sketch: bounded set algebra over hash minima
  // ---------------------------------------------------------------------

  /** Values kept per KMV sketch; relative error ≈ 1/√(k−2) ≈ 18%. */
  val ThetaK = 32

  /** Size of the contract-hash space: `__h` is uniform on [0, 2³¹). */
  val ThetaM: Long = 1L << 31

  private def thetaEstScaled(nKept: Column, theta: Column, k: Int): Column =
    when(nKept < k, nKept * lit(100L)).otherwise(
      round(lit((k - 1).toDouble * ThetaM.toDouble * 100.0) /
        theta.cast("double")).cast("long"))

  private def thetaProject(sk: DataFrame, k: Int): DataFrame =
    sk.withColumn("n_kept", size(col("mins")).cast("long"))
      .withColumn("theta",
        when(col("n_kept") < k, lit(ThetaM))
          .otherwise(element_at(col("mins"), k)))
      .withColumn("state_csv",
        concat_ws(",", transform(col("mins"), _.cast("string"))))
      .withColumn("est_scaled", thetaEstScaled(col("n_kept"), col("theta"), k))

  /** KMV distinct-count sketch per group, fully graded: the k smallest
    * distinct contract hashes (the ENTIRE sketch state, as a CSV like
    * the HLL register vector), the threshold θ = kth minimum, the
    * estimate `round((k−1)·M/θ · 100)` — exact `n_kept·100` while the
    * sketch still holds the whole hash set — and the exact distinct
    * count beside it so the error is visible in the graded row.
    *
    * Why a second distinct sketch next to HLL: KMV states support DIRECT
    * set algebra — intersection and difference estimates from the hashes
    * below the common θ ([[thetaOps]]) — where HLL can only reach an
    * intersection through inclusion–exclusion, compounding both sides'
    * errors. The price is k values of state per group instead of m
    * registers, still constant.
    *
    * Scale shape: ONE hash aggregation; the [[graft.core.BottomKDistinctAggregator]]
    * buffer is ≤ k longs, so map-side partials ship ≤ k values per
    * (partition, group) — keys never cross the shuffle, and the same
    * fold IS the distributed merge ([[thetaMerged]] grades it). */
  /** The raw per-group KMV state: (groupCol, mins) with `mins` the ≤ k
    * smallest distinct contract hashes, ascending — one bounded hash
    * aggregation. Shared by [[thetaSketch]] and the streaming
    * sketch-at-ingest fold (which collects the ≤ |groups|·k-value frame
    * per micro-batch and merges driver-side through the same
    * [[graft.core.BottomKDistinctAggregator]] insert). */
  def thetaState(df: DataFrame, groupCol: String, keyCol: String,
                 k: Int = ThetaK): DataFrame = {
    val bottomK = udaf(new graft.core.BottomKDistinctAggregator(k))
    withHash31(df, keyCol)
      .groupBy(col(groupCol)).agg(bottomK(col("__h")).as("mins"))
  }

  /** Project a (group, mins) state frame to the graded sketch report,
    * joining the exact distinct counts from `df`. */
  def thetaReportFromState(state: DataFrame, df: DataFrame, groupCol: String,
                           keyCol: String, k: Int = ThetaK): DataFrame = {
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_distinct_exact"))
    thetaProject(state, k)
      .join(exact, groupCol)
      .select(col(groupCol), col("n_kept"), col("theta"), col("state_csv"),
        col("est_scaled"), col("n_distinct_exact"))
      .orderBy(groupCol)
  }

  def thetaSketch(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int = ThetaK): DataFrame =
    thetaReportFromState(thetaState(df, groupCol, keyCol, k), df, groupCol, keyCol, k)

  /** KMV MERGEABILITY under grade: sketch each `subCol` slice of a group
    * independently, merge the per-slice states by refolding their kept
    * hashes through the same bounded buffer, and emit the merged
    * per-group sketch. The oracle derives the DIRECT single-pass
    * per-group sketch only — the graded claim is that the merge is
    * lossless (the k smallest distinct of a union are always inside the
    * per-side k-smallest sets), so any buffer that drops or duplicates a
    * minimum hash-mismatches. `n_subgroups` rides along to show the
    * merge genuinely folded multiple states. */
  def thetaMerged(df: DataFrame, groupCol: String, subCol: String,
                  keyCol: String, k: Int = ThetaK): DataFrame = {
    val bottomK = udaf(new graft.core.BottomKDistinctAggregator(k))
    val perSub = withHash31(df, keyCol)
      .groupBy(col(groupCol), col(subCol)).agg(bottomK(col("__h")).as("mins"))
    val merged = perSub
      .select(col(groupCol), explode(col("mins")).as("h"))
      .groupBy(col(groupCol)).agg(bottomK(col("h")).as("mins"))
    val subs = df.groupBy(col(groupCol))
      .agg(countDistinct(col(subCol)).as("n_subgroups"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("n_distinct_exact"))
    thetaProject(merged, k)
      .join(subs, groupCol).join(exact, groupCol)
      .select(col(groupCol), col("n_subgroups"), col("n_kept"), col("theta"),
        col("state_csv"), col("est_scaled"), col("n_distinct_exact"))
      .orderBy(groupCol)
  }

  /** Theta-sketch set algebra — the operation KMV exists for: DIRECT
    * union / intersection / difference estimates between two slices,
    * from their two bounded states alone. Both sides sketch under the
    * shared contract hash; θ = min(θ_A, θ_B) re-truncates each state to
    * its hashes below θ (each side is then a uniform sample of its set
    * at rate θ/M), and every estimate is `|below-θ set op| · M/θ`:
    * unlike [[hllIntersect]]'s inclusion–exclusion, the intersection is
    * counted directly — it can never go negative, and a difference
    * estimate exists at all. One graded row: θ, the five below-θ
    * cardinalities (a∪b, a∩b, a\b kept as exact integers), the three
    * scaled estimates, and the exact intersection/difference counts
    * beside them.
    *
    * Scale shape: two bounded aggregations over one scan each (the
    * filters run map-side), then pure ≤k-element array algebra on a
    * one-row frame — nothing after the partial aggregate depends on
    * data size. */
  def thetaOps(df: DataFrame, keyCol: String,
               predA: Column, predB: Column, k: Int = ThetaK): DataFrame = {
    val bottomK = udaf(new graft.core.BottomKDistinctAggregator(k))
    def side(pred: Column, out: String): DataFrame =
      thetaProject(
        withHash31(df.filter(pred), keyCol).agg(bottomK(col("__h")).as("mins")), k)
        .select(col("mins").as(s"mins_$out"), col("n_kept").as(s"n_kept_$out"),
          col("theta").as(s"theta_$out"))
    val exact = df.agg(
      count_distinct(when(predA && predB, col(keyCol))).as("n_inter_exact"),
      count_distinct(when(predA && !predB, col(keyCol))).as("n_diff_exact"))
    def estOf(n: Column): Column =
      round(n.cast("double") * lit(ThetaM.toDouble * 100.0) /
        col("theta").cast("double")).cast("long")
    side(predA, "a").crossJoin(broadcast(side(predB, "b")))
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
      .withColumn("ba", filter(col("mins_a"), _ < col("theta")))
      .withColumn("bb", filter(col("mins_b"), _ < col("theta")))
      .withColumn("n_a_below", size(col("ba")).cast("long"))
      .withColumn("n_b_below", size(col("bb")).cast("long"))
      .withColumn("n_inter",
        size(array_intersect(col("ba"), col("bb"))).cast("long"))
      .withColumn("n_union",
        (col("n_a_below") + col("n_b_below") - col("n_inter")).cast("long"))
      .withColumn("n_diff", (col("n_a_below") - col("n_inter")).cast("long"))
      .select(col("theta"), col("n_a_below"), col("n_b_below"), col("n_inter"),
        col("n_union"), col("n_diff"),
        estOf(col("n_union")).as("est_union_scaled"),
        estOf(col("n_inter")).as("est_inter_scaled"),
        estOf(col("n_diff")).as("est_diff_scaled"))
      .crossJoin(broadcast(exact))
  }
}
