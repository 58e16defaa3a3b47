package graft

import org.apache.spark.sql.execution.ExplainMode

/** Bucketed-lake layout: the co-located join must (a) return exactly the
  * plain join's rows and (b) plan with ZERO Exchange — the property that
  * makes the write-once bucketing pay for itself at 100 TB. */
class LakeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join matches the plain join row-for-row") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
    val bucketed = ext.Lake.bucketedJoin(spark, orders, cust, "o_custkey")
      .select("o_orderkey", "c_mktsegment").orderBy("o_orderkey").collect().toSeq
    val plain = orders.join(cust, "o_custkey")
      .select("o_orderkey", "c_mktsegment").orderBy("o_orderkey").collect().toSeq
    assert(bucketed.nonEmpty && bucketed === plain)
  }

  test("bucketed join plans as sort-merge with zero Exchange") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
    val joined = ext.Lake.bucketedJoin(spark, orders, cust, "o_custkey")
    val plan = joined.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("SortMergeJoin"), plan.takeRight(1200))
    assert(!plan.contains("Exchange"), plan.takeRight(1200))
  }

  test("declared lake_bucket_join never exchanges on the join key") {
    // the declared query may shuffle AFTER the join (the |segments|-row
    // aggregation), but a fact-table exchange on the join key would mean
    // the bucketing bought nothing
    val df = SparkEntry.queries("lake_bucket_join")(spark, sf)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("SortMergeJoin"), plan.takeRight(1200))
    assert(!plan.contains("hashpartitioning(o_custkey"), plan.takeRight(1200))
  }
}
