package graft

import graft.rel.Relational
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Gap-fill + forward-fill on a hand-computed grid: missing slots appear,
  * values carry forward within a user, never across users. */
class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("missing slots are generated and forward-filled per user") {
    // 10-min grid; user 1 observes slots 0 and 30 (gap at 10, 20),
    // user 2 observes only slot 10
    val df = Seq(
      (1L, ts(5), 10.0),   // slot 0
      (1L, ts(34), 40.0),  // slot 30
      (2L, ts(12), 7.0)    // slot 10
    ).toDF("user_id", "ts", "value")
    val got = Relational.gapFillEvents(df, stepMinutes = 10)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 10.0, true),
      (1L, 600000L, 10.0, false),   // filled from slot 0
      (1L, 1200000L, 10.0, false),  // still filled from slot 0
      (1L, 1800000L, 40.0, true),
      (2L, 600000L, 7.0, true)      // user 2's grid is just their slot
    ))
  }

  test("two observations in one slot keep the max; grid spans only [first, last]") {
    val df = Seq(
      (1L, ts(1), 3.0), (1L, ts(2), 9.0), // same slot 0: max wins
      (1L, ts(11), 1.0)
    ).toDF("user_id", "ts", "value")
    val got = Relational.gapFillEvents(df, stepMinutes = 10)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((1L, 0L, 9.0, true), (1L, 600000L, 1.0, true)))
  }

  test("every declared-grid row is filled (grids start at an observation)") {
    val out = Relational.gapFillEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    assert(out.filter(col("filled").isNull).count() == 0L)
    // and unobserved slots exist (the fill actually did something)
    assert(out.filter(!col("observed")).count() > 0L)
  }
}
