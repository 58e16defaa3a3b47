package graft

import graft.rel.Relational
import org.apache.spark.sql.functions._

/** Relational odds and ends not covered by the DuckDB oracle. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("histogram bins partition all rows; edges land in first/last bin") {
    import spark.implicits._
    // values 0.00 .. 0.99 in cents -> 10 bins of exactly 10
    val df = (0 until 100).map(i => i / 100.0).toDF("v")
    val h = Relational.histogram(df, col("v"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(h == (0L until 10L).map(b => (b, 10L)))
    // degenerate: constant column -> one bin with everything
    val one = Relational.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), col("v"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(one == Seq((0L, 3L)))
  }

  test("funnel requires strict ordering of steps per user") {
    import spark.implicits._
    def ts(minute: Int) = new java.sql.Timestamp(minute * 60000L)
    val df = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"), // full funnel
      (2L, ts(0), "view"), (2L, ts(1), "click"),                          // stops at click
      (3L, ts(5), "view"), (3L, ts(1), "click"),                          // click BEFORE view
      (4L, ts(0), "click"), (4L, ts(1), "purchase")                       // never viewed
    ).toDF("user_id", "ts", "event_type")
    val got = Relational.funnel(df, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((0, "view", 3L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("retention cohorts count distinct users per (cohort, offset)") {
    import spark.implicits._
    val week = 604800000L
    def ts(w: Long) = new java.sql.Timestamp(w * week + 1000L)
    val df = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(3)), // cohort 0, active weeks 0/1/3
      (2L, ts(0)), (2L, ts(1)),              // cohort 0, weeks 0/1
      (3L, ts(2))                            // cohort 2, week 0 only
    ).toDF("user_id", "ts")
    val got = Relational.retentionCohorts(df)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 2L), (0L, 1L, 2L), (0L, 3L, 1L), (2L, 0L, 1L)))
  }

  test("event transitions pair consecutive events per user in time order") {
    import spark.implicits._
    def ts(minute: Int) = new java.sql.Timestamp(minute * 60000L)
    val df = Seq(
      (10L, 1L, ts(0), "view"), (11L, 1L, ts(1), "click"), (12L, 1L, ts(2), "view"),
      (13L, 2L, ts(0), "view"), (14L, 2L, ts(1), "click"),
      (15L, 3L, ts(5), "error") // single event: no transition
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = Relational.eventTransitions(df)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("click", "view", 1L), ("view", "click", 2L)))
  }

  test("approx_count_distinct within configured 2% rsd of exact") {
    val rows = Relational.approxDistinctParts(Tables.lineitem(spark, sf))
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }

  test("intersect + except partition the high-balance customers") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    // both sides use the same big-order predicate, so they partition rich
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey").distinct().count()
    val active = Relational.richActiveCustomers(c, o).count()
    val inactive = Relational.richInactiveCustomers(c, o).count()
    assert(active + inactive == rich)
  }

  test("sessionize: session count bounded by events; durations non-negative") {
    val s = Relational.sessionize(Tables.events(spark, sf))
    val bad = s.filter(col("duration_ms") < 0 || col("n_events") < 1).count()
    assert(bad == 0)
  }

  test("columnProfile matches direct per-column aggregates, counts nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, 5.0), (2.0, null), (4.0, 7.5)
    ).toDF("x", "y")
    val prof = Relational.columnProfile(df, Seq("x", "y"))
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(prof == Seq(("x", 4L, 0L, 3L, 1.0, 4.0), ("y", 2L, 2L, 2L, 5.0, 7.5)))
  }

  test("statsByReturnFlag agrees with Spark's builtin stddev/corr/median") {
    val li = Tables.lineitem(spark, sf)
    val got = Relational.statsByReturnFlag(li)
      .select("l_returnflag", "stddev_qty", "corr_qty_price", "median_qty")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val want = li
      .groupBy("l_returnflag")
      .agg(stddev_samp(round(col("l_quantity"))).as("sd"),
        corr(round(col("l_quantity")), round(col("l_extendedprice"))).as("co"),
        percentile(col("l_quantity"), lit(0.5)).as("md"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (sd, co, md)) =>
      assert(math.abs(sd - want(k)._1) < 1e-9 * math.abs(sd))
      assert(math.abs(co - want(k)._2) < 1e-9 + 1e-6 * math.abs(co))
      assert(md == want(k)._3)
    }
  }

  test("hopping windows: every event lands in exactly size/hop = 4 windows") {
    val ev = Tables.events(spark, sf)
    val hop = Relational.hoppingEventCounts(ev)
    assert(hop.agg(sum(col("n"))).head.getLong(0) == 4L * ev.count())
    // epoch-aligned starts: all multiples of the 15-minute hop
    assert(hop.filter(pmod(col("ws_ms"), lit(900000L)) =!= 0).count() == 0)
  }

  test("mode: deterministic smallest-value tiebreak on count ties") {
    import spark.implicits._
    val li = Seq(("A", 1.0), ("A", 1.0), ("A", 2.0),
        ("B", 3.0), ("B", 3.0), ("B", 2.0), ("B", 2.0))
      .toDF("l_returnflag", "l_quantity")
    val m = Relational.modeQuantity(li)
      .as[(String, Double, Long)].collect().toSeq
    assert(m == Seq(("A", 1.0, 2L), ("B", 2.0, 2L))) // B ties 2↔3, smaller wins
  }

  test("approx quantiles stay within sketch rank-error bound of exact") {
    import spark.implicits._
    val n = 1000
    val li = (1 to n).map(v => ("A", v.toDouble)).toDF("l_returnflag", "l_extendedprice")
    val approx = Relational.approxPriceQuantiles(li)
      .as[(String, Int, Double)].collect().map { case (_, i, v) => i -> v }.toMap
    // accuracy=10000 ⇒ rank error ≤ n/accuracy < 1 rank on 1000 rows
    for ((idx, p) <- Seq(0 -> 0.5, 1 -> 0.9, 2 -> 0.99)) {
      val targetRank = (p * n).toInt
      assert(math.abs(approx(idx) - targetRank.toDouble) <= 1.0,
        s"p=$p approx=${approx(idx)} target≈$targetRank")
    }
  }

  test("order quantity profile: sorted array, slice fold, csv rendering") {
    import spark.implicits._
    val li = Seq((1L, 5.0), (1L, 9.0), (1L, 2.0), (1L, 9.0), (2L, 4.0))
      .toDF("l_orderkey", "l_quantity")
    val rows = Relational.orderQuantityProfile(li)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // order 1: sorted desc 9,9,5,2; top3 = 23; order 2: single item
    assert(rows == Seq((1L, 4L, 9L, 23L, "9,9,5,2"), (2L, 1L, 4L, 4L, "4")))
  }

  test("time-weighted average holds each value until the next event") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: value 10 held 60s, value 20 held 180s -> twa = (10*60+20*180)/240 = 17.5
    // the last event has no successor and contributes nothing
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (2L, ts("2024-01-01 00:01:00"), 1L, 20.0),
      (3L, ts("2024-01-01 00:04:00"), 1L, 999.0),
      (4L, ts("2024-01-01 00:00:00"), 2L, 7.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val rows = Relational.timeWeightedValue(ev)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.size == 1) // user 2 has a single event: no interval at all
    val (user, n, twa) = rows.head
    assert(user == 1L && n == 2L && math.abs(twa - 17.5) < 1e-12)
  }

  test("data-quality report counts each planted violation once") {
    import spark.implicits._
    val orders = Seq(
      (1L, Some(10L), "O", 5.0), (2L, Some(10L), "F", -1.0), // negative price
      (3L, None: Option[Long], "P", 2.0), // null custkey (also not an orphan hit)
      (4L, Some(99L), "X", 3.0) // bad status AND orphan customer
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val cust = Seq(10L).toDF("c_custkey")
    val Array(r) = graft.rel.Relational.dataQualityReport(orders, cust).collect()
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    // null custkey: NOT IN yields null -> not counted as bad status;
    // left-anti counts the null-key row as unmatched (Spark join semantics)
    assert(r.getLong(3) == 1L)
    assert(r.getLong(4) == 2L) // orders 3 (null key) and 4 (missing key)
  }

  test("percent_rank/cume_dist: hand-computed over a tiny distinct grid") {
    import spark.implicits._
    // flag A: quantities 1,1,2,5 -> grid (1:n2),(2:n1),(5:n1)
    val li = Seq(("A", 1.0), ("A", 1.0), ("A", 2.0), ("A", 5.0), ("B", 7.0))
      .toDF("l_returnflag", "l_quantity")
    val rows = Relational.quantityDistribution(li)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(rows == Seq(
      ("A", 1L, 2L, 0.0, 1.0 / 3), ("A", 2L, 1L, 0.5, 2.0 / 3),
      ("A", 5L, 1L, 1.0, 1.0), ("B", 7L, 1L, 0.0, 1.0)))
  }

  test("z-score outliers: hand-computed flag at the exact boundary") {
    import spark.implicits._
    // nine $1.00 rows and one $10.00: mean 190c, pop std 270c, z = 3.0
    val orders = ((1 to 9).map(i => (i.toLong, "P1", 1.0)) :+ (10L, "P1", 10.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val flagged = Relational.priceOutliers(orders, sigmas = 2.0)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(flagged.size == 1)
    val (key, _, cents, z) = flagged.head
    assert(key == 10L && cents == 1000L && math.abs(z - 3.0) < 1e-12)
    // strict >: z = 3.0 is NOT an outlier at sigmas = 3.0
    assert(Relational.priceOutliers(orders, sigmas = 3.0).count() == 0)
  }

  test("winsorized mean clips outliers to the snapped percentile bounds") {
    import spark.implicits._
    // one segment, balances 1..9 plus a 10_000.00 outlier (all in dollars)
    val cust = ((1 to 9).map(_.toDouble) :+ 10000.0).zipWithIndex
      .map { case (b, i) => (i.toLong, "SEG", b) }
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    // quartiles (binary-exact fractions): pos25 = 2.25 -> 325 cents,
    // pos75 = 6.75 -> 775 cents
    val Array(row) = Relational.winsorizedBalances(cust, 0.25, 0.75).collect()
    assert(row.getString(0) == "SEG" && row.getLong(1) == 10L)
    assert(row.getLong(2) == 325L && row.getLong(3) == 775L)
    // clipped cents: 325x3, 400..700, 775x3 (the 10k outlier clips too)
    val expect = (325L * 3 + (4 to 7).map(_ * 100L).sum + 775L * 3).toDouble / 10
    assert(math.abs(row.getDouble(4) - expect) < 1e-9)
  }

  test("string agg: distinct priorities per segment, canonically sorted") {
    import spark.implicits._
    val cust = Seq((1L, "AUTO"), (2L, "AUTO"), (3L, "FOOD"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "3-MEDIUM"), (11L, 1L, "1-URGENT"), (12L, 2L, "3-MEDIUM"),
      (13L, 3L, "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val got = Relational.prioritiesPerSegment(orders, cust)
      .as[(String, Long, String)].collect().toSeq
    assert(got == Seq(
      ("AUTO", 3L, "1-URGENT,3-MEDIUM"),
      ("FOOD", 1L, "5-LOW")))
  }

  test("nearest-as-of: closest either direction, before wins distance ties, band excludes") {
    import spark.implicits._
    def ev(id: Long, user: Long, tp: String, sec: Long) =
      (id, user, tp, new java.sql.Timestamp(1704067200000L + sec * 1000))
    val events = Seq(
      ev(0L, 1L, "purchase", 3600),           // errors at ±600s -> BEFORE (3000) wins the tie
      ev(1L, 1L, "error", 3000),
      ev(2L, 1L, "error", 4200),
      ev(3L, 2L, "purchase", 1000),           // only an AFTER error, closer than band
      ev(4L, 2L, "error", 1500),
      ev(5L, 3L, "purchase", 0),              // nearest error beyond ±2 h -> unmatched
      ev(6L, 3L, "error", 7300),
      ev(7L, 4L, "purchase", 100),            // no errors for this user at all
      ev(8L, 5L, "error", 50)                 // other user's error must not match
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.rel.TemporalJoins.nearestErrorPerPurchase(events)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(0L)._3.contains(1L), "equal distance: the earlier (before) error wins")
    assert(out(0L)._5.contains(600000L))
    assert(out(3L)._3.contains(4L) && out(3L)._5.contains(500000L), "after-side match")
    assert(out(5L)._3.isEmpty && out(5L)._4.isEmpty, "beyond the band -> null")
    assert(out(7L)._3.isEmpty, "no candidate -> null")
    assert(out.keySet == Set(0L, 3L, 5L, 7L), "every purchase survives, only purchases")
  }

  test("integer central moments: symmetric data is EXACTLY zero-skew; hand values check") {
    import spark.implicits._
    // symmetric {1..5}: B (the m3 numerator) must be the integer 0, so
    // skewness is exactly 0.0 — a double fold could only approximate it
    val li = (Seq.fill(1)(Seq(1, 2, 3, 4, 5)).flatten.map(q => ("S", q.toDouble)) ++
        Seq(("K", 1.0), ("K", 1.0), ("K", 1.0), ("K", 10.0)))
      .toDF("l_returnflag", "l_quantity")
    val out = Relational.momentsByGroup(li)
      .select("l_returnflag", "n", "s1", "m3_num", "skewness", "kurtosis")
      .as[(String, Long, Long, String, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("S")._4 == "0" && out("S")._5 == 0.0)
    // K = {1,1,1,10}: n=4, S1=13, S2=103, S3=1003, S4=10003
    // A = 4·103 − 13² = 243; B = 16·1003 − 12·13·103 + 2·13³ = 4374
    val k = out("K")
    assert(k._2 == 4L && k._3 == 13L)
    assert(k._4 == "4374")
    assert(math.abs(k._5 - 4374.0 / (243.0 * math.sqrt(243.0))) < 1e-15)
    assert(k._5 > 1.0, "three low + one high value is strongly right-skewed")
  }
}
