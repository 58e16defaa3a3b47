package graft

import graft.rel.{Relational, SkewJoin}
import org.apache.spark.sql.functions._

/** Two-path skew join: planted heavy-hitter keys must route through the
  * salted path without changing the join result, and the salt must be
  * content-derived (stage-retry safe). */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // key "hot" carries 500 of 520 rows; "a"/"b" are cold
  private lazy val big = ((0 until 500).map(i => ("hot", i.toLong)) ++
    (0 until 10).map(i => ("a", i.toLong)) ++
    (0 until 10).map(i => ("b", i.toLong))).toDF("k", "row_id")
  private lazy val small = Seq(("hot", 1L), ("a", 2L), ("c", 3L)).toDF("k", "dim")

  private def plain = big.join(small, Seq("k"))
    .select("k", "row_id", "dim").as[(String, Long, Long)].collect().sorted.toSeq

  test("skewAwareJoin equals the plain join (mixed hot/cold)") {
    val got = SkewJoin.skewAwareJoin(big, small, "k", 100L, 4, Seq(col("row_id")))
      .select("k", "row_id", "dim").as[(String, Long, Long)].collect().sorted.toSeq
    assert(got == plain && got.size == 510)
  }

  test("degenerate thresholds: all-cold and all-hot both equal the plain join") {
    val allCold = SkewJoin.skewAwareJoin(big, small, "k", Long.MaxValue, 4, Seq(col("row_id")))
      .select("k", "row_id", "dim").as[(String, Long, Long)].collect().sorted.toSeq
    val allHot = SkewJoin.skewAwareJoin(big, small, "k", 0L, 4, Seq(col("row_id")))
      .select("k", "row_id", "dim").as[(String, Long, Long)].collect().sorted.toSeq
    assert(allCold == plain && allHot == plain)
  }

  test("hot keys are detected and the salted path spreads them over salts") {
    val hot = SkewJoin.hotKeys(big, "k", 100L).as[String].collect().toSeq
    assert(hot == Seq("hot"))
    // content-derived salt: the hot rows actually occupy >1 sub-key
    val spread = big.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("row_id")), lit(4L))).distinct().count()
    assert(spread == 4L)
  }

  test("plan is deterministic: no rand/monotonically_increasing_id in the salt") {
    val plan = SkewJoin.skewAwareJoin(big, small, "k", 100L, 4, Seq(col("row_id")))
      .queryExecution.analyzed.toString
    assert(!plan.contains("rand(") && !plan.contains("monotonically_increasing_id"))
  }

  test("declared q_skew_join equals a plain-join aggregate on test data") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_skew_join")(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d).withColumnRenamed("o_orderkey", "l_orderkey")
    val want = li.join(ord, "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(sum(Relational.cents(col("l_extendedprice"))).as("revenue_cents"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("AQE skew splitter fires on a planted-skew shuffle join and changes nothing") {
    // one key carries ~95% of the bytes (incompressible sha2 payload so
    // the skewed shuffle partition clears the scoped byte thresholds);
    // the small side is key-unique so the join is size-preserving. The
    // aggregate groups on a DIFFERENT key than the join: grouping on
    // the join key would let the final agg reuse the join's hash
    // partitioning, and OptimizeSkewedJoin (correctly) refuses to split
    // a partition some downstream operator still requires intact.
    val wide = ((0 until 20000).map(i => ("hot", i.toLong)) ++
      (0 until 500).map(i => (s"c${i % 50}", i.toLong)))
      .toDF("k", "row_id")
      .withColumn("pad", sha2(col("row_id").cast("string"), 256))
    val dims = (Seq("hot") ++ (0 until 50).map(i => s"c$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "dim")
    val (got, plan) = SkewJoin.runWithAqeSkew(spark) {
      wide.join(dims, Seq("k"))
        .groupBy(pmod(col("row_id"), lit(10L)).as("g"))
        .agg(count(lit(1)).as("n"), sum("dim").as("s"),
          sum(length(col("pad"))).as("b"))
        .orderBy("g")
    }
    // OptimizeSkewedJoin actually split the skewed partition: the final
    // adaptive plan carries the skew=true sort-merge join marker
    assert(plan.contains("isFinalPlan=true"), plan.take(300))
    assert(plan.contains("skew=true"), plan.take(2000))
    val want = wide.join(dims, Seq("k"))
      .groupBy(pmod(col("row_id"), lit(10L)).as("g"))
      .agg(count(lit(1)).as("n"), sum("dim").as("s"),
        sum(length(col("pad"))).as("b"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq === want)
  }

  test("the scoped AQE settings are restored after the run (leak guard)") {
    val before = spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    SkewJoin.runWithAqeSkew(spark) {
      Seq(("a", 1L)).toDF("k", "v").groupBy("k").agg(sum("v").as("s"))
    }
    assert(spark.conf.getOption(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes") === before)
    assert(spark.conf.getOption(
      "spark.sql.autoBroadcastJoinThreshold") !== Some("-1"))
  }

  test("declared q_skew_join_aqe equals the manual salted path's aggregate") {
    val d = "/root/testdata/sf0.001"
    val aqe = SparkEntry.queries("q_skew_join_aqe")(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    val manual = SparkEntry.queries("q_skew_join")(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    assert(aqe == manual)
  }
}
