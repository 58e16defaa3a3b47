package graft

import graft.rel.Relational
import org.apache.spark.sql.functions._

/** Relational odds and ends not covered by the DuckDB oracle. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

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
}
