package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
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
    // argmax by right time as max_by: a declarative aggregate with a
    // map-side partial, instead of a ranking window that would shuffle and
    // sort every candidate row. Unmatched left rows keep a null struct
    // (max_by skips null ordering keys), preserving ASOF LEFT semantics.
    val leftCols = left.columns
    val rightCols = right.columns
    joined.groupBy(leftCols.map(col): _*)
      .agg(max_by(struct(rightCols.map(col): _*), rightTime).as("__best"))
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__best.$c").as(c)): _*)
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

  /** Nearest-as-of join (banded, either direction): for each left row,
    * the single right row with the SMALLEST absolute time distance
    * within ± `bandMinutes` for the same key — the "closest reading"
    * join a sensor/attribution pipeline needs when the match may be
    * before OR after. The band is what keeps it scale-honest: per-key
    * candidates stay bounded and the equi+band join never goes |L|×|R|
    * (an unbanded nearest would need a full merge of both streams).
    * Winner by one min_by aggregation with the deterministic composite
    * key (|Δt|, right ts, right id) — no window over candidates; the
    * ordering key is NULLed on unmatched rows so min_by skips them and
    * LEFT semantics survive.
    *
    * Showcase: nearest error around each purchase, same user, ±2 h. */
  def nearestErrorPerPurchase(events: DataFrame, bandMinutes: Int = 120): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    val j = purchases.join(errors,
      col("user_id") === col("e_user") &&
        col("err_ts") >= col("ts") - expr(s"INTERVAL $bandMinutes MINUTES") &&
        col("err_ts") <= col("ts") + expr(s"INTERVAL $bandMinutes MINUTES"),
      "left")
    val diff = abs(unix_millis(col("err_ts")) - unix_millis(col("ts")))
    val ordKey = when(col("err_id").isNull, lit(null))
      .otherwise(struct(diff.as("d"), unix_millis(col("err_ts")).as("m"),
        col("err_id").as("k")))
    j.groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(min_by(struct(col("err_id"),
        unix_millis(col("err_ts")).as("err_ms"), diff.as("diff_ms")), ordKey).as("__best"))
      .select(col("event_id"), col("user_id"),
        col("__best.err_id").as("err_id"), col("__best.err_ms").as("err_ts_ms"),
        col("__best.diff_ms").as("diff_ms"))
      .orderBy("event_id")
  }

  /** Banded range join: ordered pairs of events by the same user within
    * `minutes` of each other. Equi on the key, band as a join filter —
    * per-key candidate count bounds the blowup, never |L|×|R|. */
  def eventPairsWithin(events: DataFrame, minutes: Int = 30): DataFrame = {
    val a = events.select(col("user_id"), col("event_id").as("a_id"),
      col("ts").as("a_ts"), col("event_type").as("a_type"))
    val b = events.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts"))
    a.join(b,
        col("user_id") === col("b_user") &&
          col("a_ts") < col("b_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $minutes MINUTES"),
        "inner")
      .groupBy(col("a_type"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("a_id")).as("n_lead_events"))
      .orderBy("a_type")
  }
}
