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
}
