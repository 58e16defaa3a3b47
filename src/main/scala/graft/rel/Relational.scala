package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface of the engine over the TPC-H-ish test tables:
  * scan / filter / project / equi-join / broadcast-join / semi / anti /
  * agg / distinct / window / rollup / sort / limit.
  *
  * Everything is a declarative DataFrame plan — predicate pushdown, column
  * pruning, partial aggregation, AQE and join-strategy selection all come
  * from Catalyst. Scale notes per operator are in the Scaladoc.
  *
  * Money math note: the test tables keep money as 2-decimal DOUBLEs.
  * Summing raw doubles is order-dependent (Spark sums per-partition, the
  * DuckDB oracle sums in its own order), so every money aggregate here is
  * computed on exact integer cents (`round(x*100)::long`) and converted to
  * dollars once at the end — deterministic on both engines, and on a
  * 1000-executor cluster where partial-sum order is arbitrary.
  */
object Relational {

  /** Exact integer cents from a 2-decimal double. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** TPC-H Q1-style pricing summary (scan → filter-free full agg). The
    * groupBy keys are low-cardinality, so the shuffle moves only
    * |groups| × |partitions| partial rows — scale-safe by construction. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .cast("double") / 10000.0).as("sum_disc_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
          * (lit(100L) + cents(col("l_tax")))).cast("double") / 1000000.0).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / 100.0 / count(lit(1)))
          .as("avg_price"),
        (sum(cents(col("l_discount"))).cast("double") / 100.0 / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Filter + projection — predicates and the 4-column read schema are
    * pushed into the parquet scan (verify with .explain: PushedFilters). */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity") >= 48 && col("l_discount") <= lit(0.01))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Large-to-large equi-join (orders ⋈ customer) + aggregation. Both sides
    * scale with SF → shuffled hash join on the key; AQE handles skew. */
  def ordersPerSegment(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
      .orderBy("c_mktsegment")

  /** Dimension joins: nation and region are tiny at any SF — broadcast
    * explicitly so no shuffle of the fact side ever happens. */
  def customersPerRegion(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_customers"),
        (sum(cents(col("c_acctbal"))).cast("double") / 100.0).as("sum_acctbal"))
      .orderBy("r_name", "n_name")

  /** Q5-style six-table join: local-supplier revenue per nation — the
    * classic join-reorder workout. Facts (lineitem, orders) shuffle on
    * their keys; dims (supplier, nation, region) broadcast; the
    * c_nationkey = s_nationkey constraint closes the cycle. */
  def localSupplierRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                           supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .cast("double") / 10000.0).as("revenue"))
      .orderBy("r_name", "n_name")

  /** Semi join: customers having at least one order (EXISTS). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Anti join: customers with no order above `minTotal` (NOT EXISTS).
    * (Every customer has SOME order in the test data, so the unfiltered
    * anti join would be provably empty — a vacuous demo.) */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             minTotal: Double = 400000): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minTotal),
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** DISTINCT — a shuffle on the full projection; keep the projection
    * narrow so the exchange is narrow. */
  def distinctSegments(customer: DataFrame): DataFrame =
    customer.select("c_mktsegment").distinct().orderBy("c_mktsegment")

  /** Exact + approximate distinct aggregation. approx_count_distinct (HLL++)
    * is the 100 TB path: one pass, fixed memory, no per-key shuffle. */
  def supplierStats(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Global top-k — Spark's sort-limit is computed as a per-partition
    * top-k then a single k-row merge on the driver: no global sort. */
  def topOrders(orders: DataFrame, k: Int = 10): DataFrame =
    orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** Ranking window: top-3 orders per customer. Fully tie-broken ordering
    * (totalprice desc, orderkey) keeps row_number deterministic. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Running-total window over an event stream (rows-frame running sum in
    * exact cents; deterministic accumulation order via (ts, event_id)). */
  def runningUserSpend(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id"),
        (sum(cents(col("value"))).over(w).cast("double") / 100.0).as("running_spend"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy("user_id", "event_id")
  }

  /** JSON scalar functions over the events.props column: extract a field,
    * cast, bucket, aggregate. */
  def eventPropStats(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("k_mod")

  /** CUBE grouping sets over (returnflag, linestatus). */
  def returnFlagCube(lineitem: DataFrame): DataFrame =
    lineitem.cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** INTERSECT (set semantics): high-balance customers with a big order
    * (> 400k) — the complement of [[richInactiveCustomers]]. */
  def richActiveCustomers(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.filter(col("c_acctbal") > 5000).select("c_custkey")
      .intersect(orders.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** EXCEPT (set semantics): high-balance customers minus those with a
    * big order (> 400k) — non-vacuous on the test data. */
  def richInactiveCustomers(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.filter(col("c_acctbal") > 5000).select("c_custkey")
      .except(orders.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Date-part scalar functions: quarter / month / day-of-month buckets. */
  def orderDateParts(orders: DataFrame): DataFrame =
    orders.groupBy(
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"))
      .agg(count(lit(1)).as("n"))
      .orderBy("q", "dom")

  /** Exact interpolated percentiles of document length per language.
    * (`percentile` = sort-based exact quantile; for 100 TB use
    * `percentile_approx` — same plan shape, fixed memory.) */
  def docLengthPercentiles(documents: DataFrame): DataFrame =
    documents.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")

  /** Exact vs approximate (HLL++) distinct — the fixed-memory sketch is
    * the 100 TB path for distinct cardinalities. No SQL oracle (sketch
    * internals are engine-specific); ScalaTest bounds the relative error. */
  def approxDistinctParts(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  /** ROLLUP grouping sets (returnflag → returnflag×linestatus → grand). */
  def returnFlagRollup(lineitem: DataFrame): DataFrame =
    lineitem.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Date bucketing: orders per calendar month. */
  def ordersPerMonth(orders: DataFrame): DataFrame =
    orders.groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("revenue"))
      .orderBy("y", "m")

  /** CASE-expression bucketing of order value. */
  def orderValueBands(orders: DataFrame): DataFrame =
    orders.select(
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "medium")
          .otherwise("large").as("band"))
      .groupBy("band").agg(count(lit(1)).as("n"))
      .orderBy("band")

  /** String functions over part: head word of p_type, upper-cased brand. */
  def partTypeHeads(part: DataFrame): DataFrame =
    part.select(
        split(col("p_type"), " ").getItem(0).as("type_head"),
        upper(col("p_brand")).as("brand"))
      .groupBy("type_head", "brand").agg(count(lit(1)).as("n"))
      .orderBy("type_head", "brand")

  /** Sessionization: split each user's event stream at >gapMinutes idle
    * gaps (lag + running sum of break flags), then aggregate per session.
    * The same semantics run incrementally under Structured Streaming via
    * flatMapGroupsWithState — see graft.streaming.EventsStream. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withColumn("gap_ms", unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("brk", when(col("gap_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(running))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("duration_ms"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("session_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Tumbling 1-hour event windows (batch form; the same transform runs
    * under readStream with a watermark — see graft.streaming). Window
    * start is surfaced as epoch seconds: integer, engine-portable. */
  def hourlyEventStats(events: DataFrame): DataFrame =
    events.groupBy(
        unix_timestamp(window(col("ts"), "1 hour").getField("start")).as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(cents(col("value"))).cast("double") / 100.0).as("sum_value"))
      .orderBy("hour_start", "event_type")

  /** FULL OUTER join of two aggregated activity views: customers with
    * orders but no events, users with events but no orders, and the
    * matched middle all surface — pre-aggregation keeps the outer join on
    * one row per key (never row-multiplying at scale). */
  def userActivityFullOuter(orders: DataFrame, events: DataFrame): DataFrame = {
    val o = orders.groupBy(col("o_custkey").as("uid"))
      .agg(count(lit(1)).as("n_orders"))
    val e = events.groupBy(col("user_id").as("uid"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("uid"), "full_outer")
      .select(col("uid"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("uid")
  }

  /** The five event types this dataset emits — the explicit pivot column
    * list (an explicit list keeps the pivot single-pass; omitting it
    * costs a distinct-values job first). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: one row per user, one count column per event type. */
  def eventTypePivot(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy("user_id")

  /** UNPIVOT (melt): the wide per-user event-type count matrix back to
    * long (user_id, event_type, cnt) rows — the inverse surface of
    * [[eventTypePivot]] via the Dataset `unpivot` operator. Zero-count
    * cells are dropped (the long form of a sparse matrix). */
  def eventTypeUnpivot(events: DataFrame): DataFrame =
    eventTypePivot(events)
      .unpivot(Array(col("user_id")), EventTypes.map(col).toArray, "event_type", "cnt")
      .filter(col("cnt") > 0)
      .orderBy("user_id", "event_type")

  /** The SQL-surface demonstration: a correlated scalar subquery run
    * through `spark.sql` over a temp view — Catalyst decorrelates it into
    * an aggregate + join (no per-row re-scan). The SAME string is the
    * DuckDB oracle, so the comparison is engine-vs-engine on identical
    * SQL; money math in integer cents (sum·count cross-multiply instead
    * of a float average) keeps it bit-exact. */
  val CorrelatedSql: String =
    """SELECT o_custkey, count(*) AS n_above
      |FROM orders o
      |WHERE CAST(round(o.o_totalprice*100) AS BIGINT) *
      |      (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      |    > (SELECT sum(CAST(round(i.o_totalprice*100) AS BIGINT))
      |       FROM orders i WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Orders priced above their customer's average — via [[CorrelatedSql]]
    * on the engine's SQL entry point. */
  def ordersAboveCustomerAvg(orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders")
    orders.sparkSession.sql(CorrelatedSql)
  }

  /** Value-based RANGE window frame: per event, how many of the same
    * user's events (and value sum) fall in the trailing 30 minutes —
    * frame bounds in event-time milliseconds, not row counts. Partitioned
    * by user, so the frame scan distributes. */
  def trailingEventWindow(events: DataFrame, minutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(-minutes * 60000L, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        cents(col("value")).as("cents"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("trailing_value", (sum(col("cents")).over(w).cast("double") / 100.0))
      .select(col("user_id"), col("event_id"), col("n_trailing"), col("trailing_value"))
      .orderBy("user_id", "event_id")
  }

  /** NTILE quartiles of order value within each year: the window is
    * partitioned by year, so the sort distributes (no global single-
    * partition ntile — the scale trap this op usually hides). Quartile
    * edges are exact raw doubles (min/max pass through, no accumulation). */
  def priceQuartilesByYear(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("y"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders.select(year(col("o_orderdate")).as("y"),
        col("o_totalprice"), col("o_orderkey"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy("y", "quartile")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("y", "quartile")
  }

  /** Explicit GROUPING SETS (beyond ROLLUP/CUBE): per-flag totals,
    * per-status totals, and the grand total in one pass — Spark plans one
    * Expand + one aggregation, not three scans. The SAME string runs on
    * DuckDB as the oracle (engine-vs-engine on identical SQL); explicit
    * NULLS FIRST pins the cross-engine ordering of the subtotal rows. */
  val GroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Subtotals via [[GroupingSetsSql]] on the engine's SQL entry point. */
  def flagStatusGroupingSets(lineitem: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("lineitem")
    lineitem.sparkSession.sql(GroupingSetsSql)
  }

  /** Data-profiling summary: per column, row/null/distinct counts and the
    * min/max envelope — the first query a pipeline runs against an
    * unfamiliar table. ONE scan: all per-column aggregates run in a
    * single global aggregation (count-distinct expands the row Nx
    * map-side, but the table is still read once), then the wide result
    * row is unpivoted driver-free into (col_name, ...) rows. min/max are
    * order-independent pass-throughs, so doubles are engine-exact. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__n").as("n_non_null"),
        col(s"${c}__nulls").as("n_nulls"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"), col(s"${c}__max").as("max_value"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("col_name")
  }

  /** Statistical aggregates per return flag: sample standard deviation,
    * Pearson correlation and the interpolated median — computed from
    * EXACT integer power sums (quantities and whole-dollar prices are
    * integers, so sums/sums-of-squares/cross-sums are overflow-checked
    * longs), combined in one fixed double expression at the end. Unlike
    * the built-in `stddev`/`corr` (Welford-style merge whose low bits
    * depend on partition boundaries), this formulation is bit-identical
    * on any partitioning and any engine that evaluates the same final
    * expression — the portable form of a second-moment aggregate. */
  def statsByReturnFlag(lineitem: DataFrame): DataFrame = {
    val q = round(col("l_quantity")).cast("long")
    val p = round(col("l_extendedprice")).cast("long")
    val d = (c: Column) => c.cast("double")
    val agg = lineitem
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"), sum(q * q).as("sq2"),
        sum(p).as("sp"), sum(p * p).as("sp2"),
        sum(q * p).as("sqp"),
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"))
    agg.select(col("l_returnflag"), col("n"),
        sqrt((d(col("n")) * d(col("sq2")) - d(col("sq")) * d(col("sq"))) /
          (d(col("n")) * (d(col("n")) - 1.0))).as("stddev_qty"),
        ((d(col("n")) * d(col("sqp")) - d(col("sq")) * d(col("sp"))) /
          (sqrt(d(col("n")) * d(col("sq2")) - d(col("sq")) * d(col("sq"))) *
            sqrt(d(col("n")) * d(col("sp2")) - d(col("sp")) * d(col("sp")))))
          .as("corr_qty_price"),
        col("median_qty"))
      .orderBy("l_returnflag")
  }

  /** Higher central moments (skewness / kurtosis) per group, the
    * hash-graded way: built-in `skewness`/`kurtosis` are raw double
    * folds whose shuffle-order nondeterminism can never hash-match an
    * oracle. Instead the four raw power sums S1..S4 accumulate as exact
    * BIGINTs (quantities are small integers), the central-moment
    * NUMERATORS derive in DECIMAL(38,0) —
    * A = n·S2 − S1², B = n²·S3 − 3n·S1·S2 + 2S1³,
    * C = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3S1⁴ —
    * and the scale factors cancel algebraically: skew = B/A^{3/2},
    * kurt = C/A². The only doubles are the two final divisions, with
    * A^{3/2} spelled `A·√A` because `sqrt` is IEEE-correctly-rounded in
    * both engines while `pow(x, 1.5)` is not. The wide numerators ship
    * as canonical strings (the DECIMAL(38,0)-output render rule).
    *
    * Scale shape: ONE aggregation with map-side partials; four integer
    * sums per group cross the exchange, nothing else. */
  def momentsByGroup(lineitem: DataFrame): DataFrame = {
    val x = round(col("l_quantity")).cast("long")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agg = lineitem.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
    val (n, s1, s2, s3, s4) =
      (dec(col("n")), dec(col("s1")), dec(col("s2")), dec(col("s3")), dec(col("s4")))
    val a = n * s2 - s1 * s1
    val b = n * n * s3 - lit(3) * n * s1 * s2 + lit(2) * s1 * s1 * s1
    val c = n * n * n * s4 - lit(4) * n * n * s1 * s3 +
      lit(6) * n * s1 * s1 * s2 - lit(3) * s1 * s1 * s1 * s1
    val ad = a.cast("double")
    agg.select(col("l_returnflag"), col("n"), col("s1"),
        a.cast("string").as("m2_num"),
        b.cast("string").as("m3_num"),
        c.cast("string").as("m4_num"),
        (b.cast("double") / (ad * sqrt(ad))).as("skewness"),
        (c.cast("double") / (ad * ad)).as("kurtosis"))
      .orderBy("l_returnflag")
  }

  /** One-row data-quality report over orders: the validation gate an
    * ingest pipeline runs before promoting a batch — row count, null-key
    * and domain violations, referential orphans (orders whose customer is
    * missing), and negative amounts.
    *
    * Scale shape: each check is a map-side conditional partial inside ONE
    * aggregation over the fact scan; the referential check is a left-anti
    * join against the (broadcastable) key side counted in the same pass
    * shape. Single-row frames combine by broadcast crossJoin — nothing
    * corpus-sized is ever collected. */
  def dataQualityReport(orders: DataFrame, customer: DataFrame): DataFrame = {
    val base = orders.agg(
      count(lit(1)).as("n_orders"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_null_custkey"),
      sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("n_negative_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("n_bad_status"))
    val orphans = orders
      .join(customer.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_orders"))
    base.crossJoin(broadcast(orphans))
  }

  /** Quantity distribution per return flag: `percent_rank` and
    * `cume_dist` over the DISTINCT quantity grid — the normalized-rank
    * view a feature-scaling stage uses. Aggregating to the grid first
    * keeps the window input at |distinct values| per group (bounded, e.g.
    * 50 quantities), so the per-group sort never sees the fact table. */
  def quantityDistribution(lineitem: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("qty"))
    lineitem
      .groupBy(col("l_returnflag"), round(col("l_quantity")).cast("long").as("qty"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("l_returnflag", "qty")
  }

  /** Winsorized (percentile-clipped) account balances per market segment:
    * clip every balance into [p_lo, p_hi] of its segment, then report the
    * clipped mean — the outlier-robust aggregate a feature pipeline uses
    * where a raw mean would be dominated by a few extreme rows.
    *
    * Two passes by construction (exact percentiles need the data before
    * the clip can be planned): pass 1 computes per-segment bounds (a few
    * rows — broadcast back), pass 2 clips and aggregates. At 100 TB,
    * swap `percentile` for `percentile_approx` (same plan shape, fixed
    * memory) if the per-segment sort is too heavy.
    *
    * Exactness: interpolated percentile bounds are snapped to integer
    * cents (ceil on the low bound, floor on the high — both engines snap
    * identically), so every clipped value is an exact BIGINT and the sum
    * is immune to double addition order across partitions; the only
    * float op left is the final division, one fixed expression. */
  def winsorizedBalances(customer: DataFrame,
                         lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val c = cents(col("c_acctbal"))
    val bounds = customer.groupBy(col("c_mktsegment"))
      .agg(ceil(percentile(c, lit(lo))).cast("long").as("lo_cents"),
        floor(percentile(c, lit(hi))).cast("long").as("hi_cents"))
    customer.select(col("c_mktsegment"), c.as("__c"))
      .join(broadcast(bounds), "c_mktsegment")
      .withColumn("__w", least(greatest(col("__c"), col("lo_cents")), col("hi_cents")))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("lo_cents")).as("lo_cents"), min(col("hi_cents")).as("hi_cents"),
        (sum(col("__w")) / count(lit(1))).as("win_avg_cents"))
      .orderBy("c_mktsegment")
  }

  /** Per-group z-score outliers: orders whose total price sits more than
    * `sigmas` population standard deviations above their priority class's
    * mean — the anomaly screen run before training on transactional
    * features.
    *
    * Exactness at any scale: group moments come from integer power sums —
    * s1 as BIGINT, s2 in DECIMAL(38,0) (cents² terms reach ~2.5·10¹⁵, so
    * a BIGINT s2 would overflow around 3,700 rows per group; decimal
    * accumulation is exact to 10³⁸) — so mean/std are partition-order-
    * independent, unlike Welford-merge `stddev`. The tiny per-group stats
    * table broadcasts back; flagging is a map-side filter with one fixed
    * double expression both engines evaluate identically. */
  def priceOutliers(orders: DataFrame, sigmas: Double = 3.0): DataFrame = {
    val c = cents(col("o_totalprice"))
    val dec = c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val stats = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(c).as("s1"), sum(dec * dec).as("s2"))
      .select(col("o_orderpriority"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n").cast("double"))
          / col("n").cast("double")).as("std"))
    orders.select(col("o_orderkey"), col("o_orderpriority"), c.as("price_cents"))
      .join(broadcast(stats), "o_orderpriority")
      .filter(col("std") > 0 &&
        (col("price_cents").cast("double") - col("mean")) / col("std") > sigmas)
      .select(col("o_orderkey"), col("o_orderpriority"), col("price_cents"),
        ((col("price_cents").cast("double") - col("mean")) / col("std")).as("zscore"))
      .orderBy("o_orderkey")
  }

  /** Hopping (sliding) event-time windows: count and purchase value per
    * [size=1h, hop=15min] window and event type — each event lands in
    * size/hop = 4 overlapping windows. Spark's `window()` generates the
    * per-row window set inline (a projection, not a join against a
    * window table), then a plain hash aggregation on (window, type);
    * epoch-aligned starts make the result engine-portable as millis. */
  def hoppingEventCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("value"))).as("value_cents"))
      .select(unix_millis(col("window.start")).as("ws_ms"), col("event_type"),
        col("n"), (col("value_cents").cast("double") / 100.0).as("value_sum"))
      .orderBy("ws_ms", "event_type")

  /** Fixed-width histogram over exact cents: bounds in ONE aggregate
    * (single row, broadcast back — the fact table never shuffles), bin
    * index by the portable integer-scale/floor shape, then a count per
    * bin. Empty bins are omitted (a profiling report, not a chart). */
  def histogram(df: DataFrame, valueCol: Column, bins: Int): DataFrame = {
    require(bins >= 1, "need at least one bin")
    val c = cents(valueCol)
    val b = df.agg(min(c).as("__lo"), max(c).as("__hi"))
    df.crossJoin(broadcast(b))
      .select(when(col("__hi") === col("__lo"), lit(0L))
        .otherwise(least(lit((bins - 1).toLong),
          floor((c - col("__lo")) * bins / (col("__hi") - col("__lo") + 1)).cast("long")))
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  /** Ordered conversion funnel: a user reaches step i only with an event
    * of that type STRICTLY AFTER their step i-1 time (first qualifying
    * occurrence). Returns one row per step with the surviving user count.
    *
    * Each stage is a per-user min-aggregate joined to the previous
    * stage's (user, time) — all shuffles are keyed on user_id, so stages
    * co-partition and the events table is scanned once per step, never
    * self-joined all-pairs. Times compare as epoch millis so the
    * semantics are identical across engines regardless of native
    * timestamp precision. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val ms = unix_millis(col("ts"))
    val first = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(ms).as("__t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .select(col("user_id"), ms.as("__ms"))
        .join(prev, "user_id")
        .filter(col("__ms") > col("__t"))
        .groupBy("user_id").agg(min(col("__ms")).as("__t"))
    }
    stages.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step_idx"), lit(steps(i)).as("step"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("step_idx")
  }

  /** Weekly retention cohorts: users grouped by the epoch-week of their
    * first event; one row per (cohort, weeks-since-cohort) with the
    * distinct users still active. Two user-keyed shuffles (first-event
    * agg, then the cohort join rides the same key) plus the final small
    * (cohort, offset) aggregation — no calendar table, no crossJoin. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weekMs = 604800000L
    val e = events.select(col("user_id"),
      floor(unix_millis(col("ts")) / weekMs).cast("long").as("wk"))
    val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    e.join(first, "user_id")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Event-type transition counts (first-order Markov edges): per user,
    * consecutive events ordered by (epoch-ms, event_id — the stable
    * tiebreak) form (from, to) pairs; one count per ordered pair. The
    * window is user-partitioned, so the sort distributes. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("__ms"), col("event_id"))
    events.select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("__ms"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Gap-fill + forward-fill: regularize each user's event stream onto a
    * fixed time grid (every `stepMinutes` from their first to their last
    * observed slot) and carry the last observed slot value forward
    * through empty slots — the resampling step before any time-series
    * feature extraction.
    *
    * Scale shape: the grid is generated per user with `sequence` (one
    * row per user in, span/step rows out — never a global calendar
    * crossJoin), and the forward fill is the portable gaps-and-islands
    * form (a running non-null count splits each user into groups with
    * exactly one observation; `max` over the group broadcasts it) — all
    * windows are partitioned by user, so nothing funnels through a
    * single task. Values pass through untouched (max per slot), keeping
    * doubles engine-exact. */
  def gapFillEvents(events: DataFrame, stepMinutes: Int = 360): DataFrame = {
    val stepMs = stepMinutes * 60000L
    val ms = unix_millis(col("ts"))
    val e = events.select(col("user_id"), (ms - pmod(ms, lit(stepMs))).as("slot_ms"),
      col("value"))
    val grid = e.groupBy("user_id")
      .agg(min(col("slot_ms")).as("__lo"), max(col("slot_ms")).as("__hi"))
      .select(col("user_id"),
        explode(sequence(col("__lo"), col("__hi"), lit(stepMs))).as("slot_ms"))
    val obs = e.groupBy("user_id", "slot_ms").agg(max(col("value")).as("slot_max"))
    val byUser = Window.partitionBy("user_id").orderBy("slot_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "slot_ms"), "left")
      .withColumn("__grp", count(col("slot_max")).over(byUser))
      .withColumn("filled",
        max(col("slot_max")).over(Window.partitionBy(col("user_id"), col("__grp"))))
      .select(col("user_id"), col("slot_ms"), col("filled"),
        col("slot_max").isNotNull.as("observed"))
      .orderBy("user_id", "slot_ms")
  }

  /** Exact per-group mode with a deterministic tiebreak (smallest value
    * wins a count tie). The heavy reduction is the partial-agg count over
    * (group, value); the winner pick is a window over that already-tiny
    * aggregate — the window never sees base-table rows. */
  def modeQuantity(lineitem: DataFrame): DataFrame = {
    val counts = lineitem.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("mode_n"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("mode_n").desc, col("l_quantity").asc)
    counts.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_quantity"), col("mode_n"))
      .orderBy("l_returnflag")
  }

  /** Regexp extraction as a table-generating function: pull every
    * lowercase word out of part names, count corpus-wide, top k. The
    * extraction is a codegen'd per-row expression; the count is the
    * standard partial-agg shuffle; top-k is TakeOrderedAndProject. */
  def partNameWords(part: DataFrame, k: Int = 25): DataFrame =
    part.select(explode(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(k)

  /** Approximate percentiles via Spark's mergeable quantile sketch
    * (GK/KLL-family): one pass, fixed sketch size per partition, merged on
    * the reduce side — the only way percentiles scale to 100 TB without a
    * global sort. Approximate by construction → rows-only in the driver
    * harness; RelationalSpec bounds the rank error against the exact
    * percentiles. */
  def approxPriceQuantiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
      .select(col("l_returnflag"), posexplode(col("qs")).as(Seq("q_idx", "q_value")))
      .orderBy("l_returnflag", "q_idx")

  /** Array-column aggregation surface: per order, the full sorted quantity
    * vector plus derived scalars — list agg (`collect_list`), array sort,
    * slice, fold (`aggregate`) and rendering (`array_join`) in one plan.
    * The array is rendered as CSV text because arrays are per-order small
    * but engine-specific as a column type; the CSV string is portable.
    *
    * Scale: one hash-shuffle on the order key; each group's array is
    * bounded by lines-per-order (≤ 7 in TPC-H-shaped data), so no group
    * ever outgrows an executor. */
  def orderQuantityProfile(lineitem: DataFrame, topN: Int = 3): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("q")), asc = false).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).cast("long").as("n_items"),
        element_at(col("qs"), 1).as("max_qty"),
        aggregate(slice(col("qs"), 1, topN), lit(0L), _ + _).as("top3_sum"),
        array_join(col("qs"), ",").as("qtys_desc"))
      .orderBy("l_orderkey")

  /** Time-weighted average of `value` per user: each observation is held
    * until the next event, weighted by the hold duration. The classic
    * irregular-time-series aggregate (billing, utilization, price TWAP).
    *
    * Determinism/scale: durations are exact epoch-microsecond BIGINTs and
    * values exact integer cents; the value·duration products accumulate in
    * DECIMAL(38,0) (a BIGINT sum would overflow near 10⁴ user-years of
    * µs·cents mass), with ONE double division at the end. Lead + agg are
    * both user-partitioned — no global stage. */
  def timeWeightedValue(events: DataFrame): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        cents(col("value")).as("v_cents"))
      .withColumn("dt_us",
        unix_micros(lead(col("ts"), 1).over(byUser)) - unix_micros(col("ts")))
      .filter(col("dt_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum((col("v_cents") * col("dt_us")).cast(dec38)).as("__w"),
        sum(col("dt_us")).as("__t"))
      .select(col("user_id"), col("n_intervals"),
        ((col("__w").cast("double") / col("__t").cast("double")) / 100.0).as("twa_value"))
      .orderBy("user_id")
  }

  /** Ordered string aggregation (LISTAGG): the distinct order priorities
    * seen per market segment, canonically sorted and joined. The sorted
    * `collect_set` keeps the result independent of shuffle order; per-group
    * cardinality is bounded by the domain (priorities), not the row count,
    * so the collected sets stay small at any scale. NULL priorities are
    * excluded from the list (collect_set skips NULLs; the oracle mirrors
    * that with a FILTER clause) but still count toward n_orders. */
  def prioritiesPerSegment(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"))
      .orderBy("c_mktsegment")

  /** TPC-H Q3 (shipping priority), adapted to this schema: revenue of
    * BUILDING-segment orders placed before the pivot date whose items
    * shipped after it, top 10 by revenue. The classic
    * selective-dims → fact-join → agg → top-k anchor: the segment
    * filter prunes customer BEFORE the join, both joins are key
    * equi-joins (AQE picks broadcast when the filtered dims are small),
    * revenue accumulates in exact cents like q_multi_join, and the
    * top-10 plans as TakeOrderedAndProject with a fully deterministic
    * (revenue desc, date, key) tie order. */
  def q3ShippingPriority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame,
                         pivot: String = "1998-01-01"): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit(pivot).cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit(pivot).cast("timestamp"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  /** TPC-H Q18 (large-volume customers), adapted: orders whose total
    * item quantity exceeds `minQty`, with the customer attached — the
    * agg-then-HAVING-then-rejoin anchor. The quantity aggregate runs
    * over the FACT table alone first (map-side partial combine, one
    * shuffle on the order key), the HAVING threshold filters before
    * anything joins, and only surviving order keys rejoin the
    * orders/customer dims — at 100 TB the rejoin input is the few
    * over-threshold keys, not the fact table. Quantities are integral
    * by data contract; round-to-long keeps the sum exact and
    * engine-portable. */
  def q18LargeOrders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, minQty: Long = 250L): DataFrame =
    lineitem.groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        (cents(col("o_totalprice")).cast("double") / 100.0).as("o_totalprice"),
        col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))

  /** k-anonymity audit over a quasi-identifier tuple — the governance
    * check a data release runs before publishing: any combination of
    * (segment, nation, coarse balance band) shared by fewer than `k`
    * customers is a re-identification risk, and the release either
    * generalizes the band or suppresses those rows. Output = the
    * violating combinations with their sizes (empty output == k-anonymous
    * at this generalization level). One hash aggregation over the
    * quasi-identifier key, then a map-side-filterable threshold — the
    * same shape as any group-count query, at any scale. The band uses
    * floor (not int cast) so negative balances band downward like the
    * oracle's. */
  def kAnonymityViolations(customer: DataFrame, k: Long = 3L): DataFrame =
    customer.groupBy(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy("c_mktsegment", "c_nationkey", "acctbal_band")
}
