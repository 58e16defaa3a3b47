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

  // ---- small-file compaction ----

  test("compact bin-packs files to the byte-derived count and preserves content exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("lake_compact").toString
    docs.repartition(32).write.parquet(s"$base/frag")
    val before = new java.io.File(s"$base/frag").listFiles()
      .filter(f => f.getName.startsWith("part-"))
    val bytes = before.map(_.length).sum
    // target = half the total bytes -> exactly 2 output files
    val stats = ext.Lake.compact(spark, s"$base/frag", s"$base/packed", (bytes + 1) / 2)
    assert(stats.filesBefore == 32 && stats.bytesBefore == bytes)
    assert(stats.filesAfter == 2)
    val got = spark.read.parquet(s"$base/packed")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    val want = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("compact plans without a shuffle: coalesce, not repartition") {
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("lake_compact_plan").toString
    docs.repartition(16).write.parquet(s"$base/frag")
    // replicate the compaction read+coalesce and check its plan directly
    val plan = spark.read.parquet(s"$base/frag").coalesce(2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("Coalesce"), plan.takeRight(800))
    assert(!plan.contains("Exchange"), plan.takeRight(800))
  }

  test("partitioned layout prunes at the listing: PartitionFilters on the scan, other dirs untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("lake_part").toString + "/t"
    docs.write.partitionBy("lang").parquet(base)
    val pruned = spark.read.parquet(base).filter(col("lang") === "en")
    val plan = pruned.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the predicate must reach the scan as a PARTITION filter (resolved
    // against directory names), not a post-scan data Filter
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan.takeRight(900))
    val got = pruned.select("doc_id").as[Long].collect().toSet
    val want = docs.filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
    // the partition column round-trips from the PATH, not the file bytes
    assert(pruned.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
  }

  test("compact of a tiny table still emits at least one file") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("lake_compact_one").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(8).write.parquet(s"$base/frag")
    val stats = ext.Lake.compact(spark, s"$base/frag", s"$base/packed", 1L << 30)
    assert(stats.filesAfter == 1)
    assert(spark.read.parquet(s"$base/packed").count() == 2)
  }
}
