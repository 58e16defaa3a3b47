package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins: as-of (latest right row at or before each left time)
  * and banded range joins.
  *
  * Spark-first composition: both reduce to an equi-join on the key with a
  * time-range conjunct — Catalyst plans the equi part as a shuffled hash /
  * sort-merge join and evaluates the range as a join filter, so cost
  * scales with per-key match counts, never |L|×|R|. The as-of winner is
  * picked by a ranking window over the candidates (argmax by right time).
  * At warehouse scale, bucket both sides on the key to make this
  * exchange-free (see ScaleSpec's bucketed-join proof).
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the single right row with the
    * greatest `rightTime <= leftTime` for the same key (left rows without
    * a match are kept with nulls — ASOF LEFT semantics).
    *
    * `leftId` must be unique per left row; ties on rightTime must be
    * pre-resolved on the right side (dedupe to one row per key+time) for
    * deterministic output.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftId: String, leftKey: Column, rightKey: Column,
                   leftTime: Column, rightTime: Column): DataFrame = {
    val joined = left.join(right, leftKey === rightKey && rightTime <= leftTime, "left")
    val w = Window.partitionBy(col(leftId)).orderBy(rightTime.desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest order at or before each event, per user — the engine's as-of
    * showcase over the test tables. */
  def latestOrderPerEvent(events: DataFrame, orders: DataFrame): DataFrame = {
    // one row per (custkey, orderdate): deterministic as-of winner on ties
    val ord = orders.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asofBackward(
        events.select(col("event_id"), col("user_id"), col("ts")), ord,
        leftId = "event_id",
        leftKey = col("user_id"), rightKey = col("o_custkey"),
        leftTime = col("ts"), rightTime = col("o_orderdate"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_date_ms"))
      .orderBy("event_id")
  }

  /** Banded range join: events within `days` after an order by the same
    * user, aggregated per order priority. Equi on the key, band as a join
    * filter. */
  def eventsNearOrders(events: DataFrame, orders: DataFrame, days: Int = 1): DataFrame =
    orders.join(events,
        col("o_custkey") === col("user_id") &&
          col("ts") >= col("o_orderdate") &&
          col("ts") <= col("o_orderdate") + expr(s"INTERVAL $days DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("o_orderpriority")
}
