package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table lake layout: the co-located-join machinery.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is the shuffle:
  * both sides hash-exchange on the key before the join can run. Spark's
  * native bucketing removes that exchange for every subsequent join on
  * the bucket key — each table is written pre-hash-partitioned into a
  * fixed number of bucket files (`hash(key) % n`), so a scan already
  * satisfies `HashClusteredDistribution(key)` and the sort-merge join
  * reads both sides bucket-by-bucket with ZERO Exchange in the plan
  * (PlanSpec asserts exactly that). The shuffle is paid ONCE at write
  * time and amortized over every downstream join/aggregation on the key —
  * the standard warehouse layout for repeatedly-joined fact tables.
  *
  * The reference has no persistent layout at all (chunks are transient
  * pickle blobs, `KeyValueStore.py:22-25`); this is the Spark-first
  * answer to "how do repeated queries avoid re-shuffling the corpus".
  */
object Lake {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. The table
    * registers in the session catalog (bucket metadata lives there — plain
    * `spark.read.parquet` would see the files but not the bucketing), with
    * data under `dir/table`. */
  def writeBucketed(df: DataFrame, table: String, dir: String, nBuckets: Int,
                    key: String, sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite").format("parquet")
      .option("path", s"$dir/$table")
      .bucketBy(nBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Materialize both sides bucketed on the join key, then join the
    * bucketed tables. The `merge` hint pins sort-merge (the strategy
    * bucketing accelerates; a broadcast would hide the exchange-free
    * proof), and because both scans are bucketed `nBuckets`-ways on `key`
    * the physical plan contains no Exchange at all.
    *
    * Side-file hygiene: names carry a nonce so concurrent callers (test
    * suites run in parallel in one JVM) never overwrite each other's
    * files while a lazy plan is still reading them. A production
    * deployment writes the bucketed tables once under stable names and
    * runs many queries against them — the write is the amortized cost,
    * not part of the per-query path.
    */
  def bucketedJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
                   key: String, nBuckets: Int = 8): DataFrame = {
    val id = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong()).take(12)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_lake_$id"
    writeBucketed(left, s"graft_bl_$id", dir, nBuckets, key)
    writeBucketed(right, s"graft_br_$id", dir, nBuckets, key)
    spark.table(s"graft_bl_$id").hint("merge")
      .join(spark.table(s"graft_br_$id"), key)
  }
}
