package graft

import graft.ext.Sketches
import org.apache.spark.sql.functions._

/** Contract-hash sketches: the estimates must actually estimate (HLL
  * within its standard-error band, CMS never undercounting), and the
  * sketch states must merge the way a distributed partial aggregation
  * requires (register-wise max / cell-wise sum). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("HLL estimate lands within the m=64 error band; state is the full register vector") {
    val rows = Sketches.hllDistinct(Tables.lineitem(spark, sf), "l_returnflag", "l_partkey")
      .select("l_returnflag", "registers_csv", "pow_sum", "est_scaled", "n_distinct_exact")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq("A", "N", "R"))
    for ((flag, csv, powSum, estScaled, exact) <- rows) {
      val regs = csv.split(",").map(_.toLong)
      assert(regs.length == Sketches.HllM, s"$flag: ${regs.length} registers")
      // pow_sum is derivable from the registers — internal consistency
      assert(regs.map(r => 1L << (26 - r).toInt).sum == powSum, flag)
      // 3 standard errors at m=64 is ~39%
      val est = estScaled / 100.0
      assert(math.abs(est - exact) <= 0.39 * exact,
        s"$flag: est $est vs exact $exact out of band")
    }
  }

  test("HLL sketch state merges by register-wise max (the distributed-aggregation property)") {
    val li = Tables.lineitem(spark, sf).withColumn("g", lit("all"))
    def regs(df: org.apache.spark.sql.DataFrame): Array[Long] =
      Sketches.hllDistinct(df, "g", "l_partkey")
        .select("registers_csv").as[String].head().split(",").map(_.toLong)
    val whole = regs(li)
    val partA = regs(li.filter(col("l_orderkey") % 2 === 0))
    val partB = regs(li.filter(col("l_orderkey") % 2 =!= 0))
    // keys appear in both halves — merge must still equal the whole
    assert(partA.zip(partB).map { case (a, b) => math.max(a, b) }.toSeq == whole.toSeq)
  }

  test("HLL intersection: inclusion-exclusion identity, subset/disjoint limits") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf)
    val r = graft.ext.Sketches.hllIntersect(li, "l_orderkey",
        col("l_shipdate") < org.apache.spark.sql.functions.lit("1997-01-01").cast("timestamp"),
        col("l_shipdate") >= org.apache.spark.sql.functions.lit("1996-01-01").cast("timestamp"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (pa, pb, pu, ea, eb, eu, ei, exact) = r
    assert(ei == ea + eb - eu, "the estimate must BE the inclusion-exclusion identity")
    // register-wise max can only raise ranks -> union pow sum never exceeds either side
    assert(pu <= math.min(pa, pb))
    assert(exact > 0, "slices must genuinely overlap in the fixture")
    // A ∩ A == A exactly: identical predicates give identical sketches
    val self = graft.ext.Sketches.hllIntersect(li, "l_orderkey",
        col("l_returnflag") === "R", col("l_returnflag") === "R")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(self._7 == self._4 && self._3 == self._1)
    // disjoint slices (key parity): union strictly coarser than either side
    val disj = graft.ext.Sketches.hllIntersect(li, "l_orderkey",
        col("l_orderkey") % 2 === 0, col("l_orderkey") % 2 === 1)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(disj._8 == 0, "parity-disjoint keys cannot intersect")
    assert(disj._3 < math.min(disj._1, disj._2))
  }

  test("CMS never undercounts — for EVERY word, not just the graded heavy hitters") {
    val docs = Tables.documents(spark, sf)
    val nWords = graft.text.Tokenize.tokenize(docs, "text", "doc_id")
      .filter(col("word") =!= "").select("word").distinct().count().toInt
    val all = Sketches.cmsTokenCounts(docs, topK = nWords)
      .select("word", "cms_count", "true_count", "over_count")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(all.size == nWords)
    assert(all.forall(_._4 >= 0), all.filter(_._4 < 0).take(3).toString)
    assert(all.forall(r => r._2 == r._3 + r._4))
    // with w=256 cells over a small vocabulary, most probes are exact
    assert(all.count(_._4 == 0) > all.size / 2)
  }

  test("HLL plans as a partial aggregation: register maxes combine before the exchange") {
    val plan = Sketches.hllDistinct(Tables.lineitem(spark, sf), "l_returnflag", "l_partkey")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.takeRight(600))
  }

  test("hll merge: register-wise max of group sketches == single-pass sketch") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // keys deliberately OVERLAP across groups: a lossy merge (e.g.
    // summing estimates instead of maxing registers) would double-count
    val df = ((0L until 600L).map(k => (k, "g1")) ++
        (300L until 900L).map(k => (k, "g2")) ++
        (0L until 100L).map(k => (k, "g3")))
      .toDF("k", "g")
    val row = graft.ext.Sketches.hllMerged(df, "g", "k")
      .as[(String, Long, Long, Long, Long, Long)].head()
    val (csv, powSum, est, estDirect, nGroups, exact) = row
    assert(est == estDirect, "merged estimate must equal the direct sketch's")
    assert(nGroups == 3L && exact == 900L)
    // merged state IS the direct state, not just the estimate
    val direct = graft.ext.Sketches.hllDistinct(
        df.withColumn("all", org.apache.spark.sql.functions.lit("x")), "all", "k")
      .select(col("registers_csv"), col("pow_sum")).as[(String, Long)].head()
    assert((csv, powSum) == direct)
    // the naive lossy merge (sum of per-group estimates) overcounts here
    val perGroup = graft.ext.Sketches.hllDistinct(df, "g", "k")
      .select(col("est_scaled")).as[Long].collect().sum
    assert(perGroup > est, "overlapping groups: summed estimates must exceed the union's")
  }

  test("quantile sketch: kept set within capacity, ranks within the sampling error band") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // values are a shuffled permutation of 0..N-1 (value = bit-reversed
    // id), so the true phi-quantile rank is exactly phi*N and the rank
    // error is directly observable
    val n = 20000L
    val df = (0L until n).map(i => (i, java.lang.Long.reverse(i) >>> 16))
      .toDF("id", "value") // >>> 16: keep the reversal within 48 bits
    val out = graft.ext.Sketches
      .quantileSketch(df, "value", col("id"), Seq(10, 25, 50, 75, 90, 99))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out.size == 6)
    val capacity = graft.ext.Sketches.QsCapacity
    out.foreach { case (q, nTotal, level, nKept, target, estIdx, _, estRank, err) =>
      assert(nTotal == n)
      assert(nKept <= capacity, s"q=$q: kept $nKept exceeds capacity — the cut failed")
      assert(estIdx >= 1L && estIdx <= nKept)
      assert(estRank >= 1L && estRank <= n)
      // rank error of a 2^-L uniform sample: O(sqrt(N * 2^L)) w.h.p.;
      // 6 sigma of the binomial bound — loose enough to be flake-free,
      // tight enough that an off-by-a-bucket bug (error ~N/capacity*k)
      // or a broken hash (error ~N) fails loudly
      val bound = 6.0 * math.sqrt(n.toDouble * (1L << level).toDouble)
      assert(err.toDouble <= bound,
        s"q=$q: rank error $err exceeds the sampling band $bound (level $level)")
    }
    // the cut is the SMALLEST fitting level: one level lower must overflow
    val level = out.head._3
    if (level > 0) {
      val oneLower = graft.ext.Sketches
        .quantileSketch(df, "value", col("id"), Seq(50), capacity = capacity * 2)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()._3
      assert(oneLower < level, "doubling capacity must admit a lower level")
    }
    // determinism: same data, same sketch, row for row
    val again = graft.ext.Sketches
      .quantileSketch(df, "value", col("id"), Seq(10, 25, 50, 75, 90, 99))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(again == out)
  }

  test("grouped quantile sketch: per-group == independent sketches, distributed sort") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    import spark.implicits._
    // three groups of very different sizes (cuts must differ per group)
    val df = ((0L until 8000L).map(i => ("big", i, java.lang.Long.reverse(i) >>> 16)) ++
        (8000L until 8800L).map(i => ("mid", i, i * 37 % 1000)) ++
        (8800L until 8830L).map(i => ("tiny", i, i)))
      .toDF("g", "id", "value")
    val grouped = graft.ext.Sketches
      .quantileSketchGrouped(df, "g", "value", col("id"), Seq(50, 90))
    val got = grouped.select(concat_ws("|", col("g"), col("q_pct"), col("n_total"),
        col("level"), col("n_kept"), col("target_rank"), col("est_idx"),
        col("est_value"), col("est_rank"), col("rank_err")))
      .as[String].collect().toSeq
    // each group must equal its own single-group sketch, row for row
    val want = Seq("big", "mid", "tiny").flatMap { g =>
      graft.ext.Sketches
        .quantileSketch(df.filter(col("g") === g), "value", col("id"), Seq(50, 90))
        .select(concat_ws("|", org.apache.spark.sql.functions.lit(g), col("q_pct"),
          col("n_total"), col("level"), col("n_kept"), col("target_rank"),
          col("est_idx"), col("est_value"), col("est_rank"), col("rank_err")))
        .as[String].collect().toSeq
    }
    assert(got.sorted == want.sorted,
      s"grouped sketch diverges from per-group sketches:\n got=$got\nwant=$want")
    // a small group keeps everything (level 0, kept == n)
    val tiny = grouped.filter(col("g") === "tiny").select("level", "n_kept", "n_total")
      .as[(Long, Long, Long)].head()
    assert(tiny._1 == 0L && tiny._2 == tiny._3, s"tiny group must keep all rows: $tiny")
    // the kept-frame sort is group-partitioned, never a global funnel
    val plan = grouped.queryExecution.executedPlan.toString
    val windows = plan.split("\n").filter(_.contains("Window"))
    assert(!windows.exists(_.contains("SinglePartition")),
      "grouped kept sort must partition by group")
  }

  test("quantile sketch merge: union-and-recut of half sketches == direct sketch") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = (0L until 20000L).map(i => (i, java.lang.Long.reverse(i) >>> 16))
      .toDF("id", "value")
    val r = graft.ext.Sketches.quantileSketchMerged(df, "value", col("id"))
      .collect().head
    val get = (c: String) => r.get(r.fieldIndex(c))
    Seq("level", "n_kept", "sum_v", "min_v", "max_v").foreach { c =>
      assert(get(s"${c}_merged") == get(s"${c}_direct"),
        s"$c: merged=${get(s"${c}_merged")} direct=${get(s"${c}_direct")} — merge lost rows")
    }
  }

  test("theta sketch: exact below k, in the k=32 error band above, state sorted and bounded") {
    import spark.implicits._
    // small group: fewer distinct keys than k -> sketch IS the set, est exact
    val small = (0L until 10L).map(k => (k, "s")).toDF("k", "g")
    val sr = Sketches.thetaSketch(small, "g", "k")
      .select("n_kept", "theta", "state_csv", "est_scaled", "n_distinct_exact")
      .as[(Long, Long, String, Long, Long)].head()
    assert(sr._1 == 10L && sr._2 == Sketches.ThetaM && sr._4 == 1000L && sr._5 == 10L)
    // real table: state is exactly k ascending distinct hashes; 3 sigma
    // at k=32 is ~3/sqrt(30) ~ 55%
    val rows = Sketches.thetaSketch(Tables.lineitem(spark, sf), "l_returnflag", "l_partkey")
      .select("l_returnflag", "n_kept", "theta", "state_csv", "est_scaled", "n_distinct_exact")
      .as[(String, Long, Long, String, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq("A", "N", "R"))
    for ((flag, nKept, theta, csv, estScaled, exact) <- rows) {
      val mins = csv.split(",").map(_.toLong)
      assert(nKept == Sketches.ThetaK && mins.length == Sketches.ThetaK, flag)
      assert(mins.toSeq == mins.sorted.toSeq && mins.distinct.length == mins.length, flag)
      assert(theta == mins.last, flag)
      val est = estScaled / 100.0
      assert(math.abs(est - exact) <= 0.55 * exact,
        s"$flag: est $est vs exact $exact out of band")
    }
  }

  test("theta sketch state is partitioning-invariant (the bounded merge is lossless)") {
    val li = Tables.lineitem(spark, sf)
    def states(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      Sketches.thetaSketch(df, "l_returnflag", "l_partkey")
        .select("l_returnflag", "state_csv")
        .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    assert(states(li.repartition(1)) == states(li.repartition(13)))
  }

  test("theta merge: per-slice states refolded == direct sketch, overlapping slices") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // keys overlap across slices: a merge that double-counted or dropped
    // a minimum would diverge from the direct sketch
    val df = ((0L until 600L).map(k => (k, "g", "s1")) ++
        (300L until 900L).map(k => (k, "g", "s2")) ++
        (0L until 100L).map(k => (k, "g", "s3")))
      .toDF("k", "g", "sub")
    val merged = Sketches.thetaMerged(df, "g", "sub", "k")
      .select("n_subgroups", "state_csv", "est_scaled")
      .as[(Long, String, Long)].head()
    val direct = Sketches.thetaSketch(df, "g", "k")
      .select(col("state_csv"), col("est_scaled")).as[(String, Long)].head()
    assert(merged._1 == 3L)
    assert((merged._2, merged._3) == direct)
  }

  test("bloom screen: no false negatives, verdict algebra, bounded bit population") {
    import org.apache.spark.sql.functions.{col, lit}
    val li = Tables.lineitem(spark, sf)
    val rows = Sketches.bloomScreen(li, "l_orderkey",
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .as[(Long, Boolean, Boolean, Boolean, Long, Long)].collect().toSeq
    assert(rows.size == 50)
    for ((key, might, inA, isFp, nBits, nA) <- rows) {
      // the one-sided guarantee: a member is NEVER screened out
      assert(!inA || might, s"false negative on $key")
      assert(isFp == (might && !inA), s"verdict algebra broken on $key")
      assert(nBits > 0 && nBits <= math.min(Sketches.BloomM.toLong,
        Sketches.BloomD.toLong * nA))
    }
    // overlapping slices: the probe set genuinely contains members
    assert(rows.exists(_._3), "fixture must include true members")
    assert(rows.exists(!_._3), "fixture must include non-members")
    // self-screen: probing A against itself can have no FPs at all
    val self = Sketches.bloomScreen(li, "l_orderkey",
        col("l_returnflag") === "R", col("l_returnflag") === "R")
      .as[(Long, Boolean, Boolean, Boolean, Long, Long)].collect().toSeq
    assert(self.forall(r => r._2 && r._3 && !r._4))
  }

  test("theta set algebra: self-intersection exact, disjoint slices, never negative") {
    import org.apache.spark.sql.functions.{col, lit}
    val li = Tables.lineitem(spark, sf)
    def opsRow(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val r = Sketches.thetaOps(li, "l_orderkey", a, b).collect().head
      val get = (c: String) => r.getLong(r.fieldIndex(c))
      get
    }
    // A ∩ A == A: identical predicates give identical below-theta sets
    val self = opsRow(col("l_returnflag") === "R", col("l_returnflag") === "R")
    assert(self("n_inter") == self("n_a_below"))
    assert(self("n_diff") == 0L && self("est_diff_scaled") == 0L)
    assert(self("n_diff_exact") == 0L)
    // parity-disjoint keys: exact intersection empty; the DIRECT theta
    // estimate stays >= 0 by construction (HLL's subtraction can't say that)
    val disj = opsRow(col("l_orderkey") % 2 === 0, col("l_orderkey") % 2 === 1)
    assert(disj("n_inter_exact") == 0L)
    assert(disj("est_inter_scaled") >= 0L)
    // the graded fixture slices genuinely overlap
    val real = opsRow(
      col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
      col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    assert(real("n_inter_exact") > 0L && real("n_inter") > 0L)
    // identities that must hold exactly on the below-theta sets
    assert(real("n_union") == real("n_a_below") + real("n_b_below") - real("n_inter"))
    assert(real("n_diff") == real("n_a_below") - real("n_inter"))
  }
}
