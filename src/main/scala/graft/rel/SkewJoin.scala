package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join: the two-path (cold/hot) plan for joins whose
  * key distribution has heavy hitters that would otherwise pin one
  * reducer per hot key.
  *
  * Cold keys take the ordinary shuffle join. Hot keys — detected with one
  * aggregation over the big side, a driver-sized list by construction —
  * take the salted path: the big side spreads each hot key over `salts`
  * deterministic sub-keys, the small side replicates its hot-key rows
  * `salts`×, and the join runs on (key, salt), turning one hot reducer
  * into `salts` even ones. The result is EXACTLY the plain join's.
  *
  * The salt must derive from row CONTENT (caller-supplied columns), never
  * `rand()`/`monotonically_increasing_id()`: under a stage retry a
  * recomputed row must land on the same reducer or rows double-count
  * (the wordCountSalted lesson). At 100 TB, detection would read prior
  * table stats or a sample instead of a full scan; AQE's skew handling is
  * the runtime complement — this operator is the explicit, declarative
  * form the caller controls.
  */
object SkewJoin {

  /** Keys of `df` appearing more than `threshold` times. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > threshold).select(key)

  /** Two-path inner equi-join of `big` and `small` on `key` (same column
    * name both sides). `saltCols` are big-side columns whose hash spreads
    * a hot key's rows — they should (near-)distinguish rows within one
    * key (a line number, an event id). */
  def skewAwareJoin(big: DataFrame, small: DataFrame, key: String,
                    hotThreshold: Long, salts: Int,
                    saltCols: Seq[Column]): DataFrame = {
    require(salts > 1, "salts must be > 1")
    require(saltCols.nonEmpty, "need at least one salt-source column")
    val hot = hotKeys(big, key, hotThreshold)
    val cold = big.join(broadcast(hot), Seq(key), "left_anti")
      .join(small, Seq(key))
    val saltedBig = big.join(broadcast(hot), Seq(key))
      .withColumn("__salt", pmod(xxhash64(saltCols: _*), lit(salts.toLong)))
    val saltedSmall = small.join(broadcast(hot), Seq(key))
      .withColumn("__salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    val hotJoined = saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
    cold.unionByName(hotJoined)
  }

  /** AQE-skew session settings: aggressive enough that the runtime
    * splitter engages at test scale (a partition is skewed when larger
    * than the median AND the byte threshold; split into advisory-sized
    * chunks), with broadcast off so the join actually shuffles. */
  private val AqeSkewConf = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** Execute `build`'s frame EAGERLY under scoped session settings,
    * restoring every key afterwards (set-and-leak would silently
    * re-plan every later query in the session — the aggressive
    * advisory/threshold bytes here must never escape). Returns the
    * collected rows re-wrapped as a local frame plus the FINAL adaptive
    * plan string (isFinalPlan=true), which is what the spec greps for
    * the skew=true marker. */
  private[graft] def runWithAqeSkew(spark: org.apache.spark.sql.SparkSession)
                                   (build: => DataFrame): (DataFrame, String) = {
    val conf = spark.conf
    val saved = AqeSkewConf.map { case (k, _) => k -> conf.getOption(k) }
    AqeSkewConf.foreach { case (k, v) => conf.set(k, v) }
    try {
      val df = build
      val rows = df.collect() // bounded: every caller aggregates first
      val plan = df.queryExecution.executedPlan.toString
      val out = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), df.schema)
      (out, plan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** The q_skew_join query WITHOUT the manual two-path salt: a plain
    * shuffle join handed to Spark's own AQE skew splitter
    * (OptimizeSkewedJoin) under scoped runtime settings — the
    * cross-validation that the declarative salted operator and the
    * runtime re-planner agree on the same oracle. The manual path stays
    * the one that covers AGGREGATION skew, which the AQE join splitter
    * does not. The aggregate is bounded (one row per order priority),
    * so the eager scoped run collects a handful of rows. */
  def aqeSkewJoinAgg(spark: org.apache.spark.sql.SparkSession,
                     big: DataFrame, small: DataFrame, key: String,
                     aggCols: DataFrame => DataFrame): DataFrame =
    runWithAqeSkew(spark) { aggCols(big.join(small, Seq(key))) }._1
}
