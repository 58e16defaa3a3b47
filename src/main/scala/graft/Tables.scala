package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (see TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events.ts has shipped under different physical parquet types across
    * testdata generations — TIMESTAMP(NANOS) (which Spark can only surface
    * as a raw long, SPARK-40819), TIMESTAMP(MICROS) without UTC adjustment
    * (surfaced as TIMESTAMP_NTZ), and UTC-adjusted TIMESTAMP(MICROS/MILLIS).
    * At 100 TB, files come from many writers, so pinning any one physical
    * type is a loader that dies on the next writer version: read the file,
    * inspect the surfaced type, and normalize to a session-zoned
    * TimestampType at microsecond precision (the same floor DuckDB applies
    * when it loads nanos into its micro-precision TIMESTAMP, so oracle
    * comparisons agree). */
  def events(s: SparkSession, d: String): DataFrame = {
    val (df, nanos) = rawEventsWithNanosFlag(s, d)
    normalizeTs(df, nanosAsLong = nanos)
  }

  /** The events frame exactly as the parquet reader surfaces it, before
    * the `ts` normalization. The nanos-as-long legacy flag is session-global,
    * so it is set ONLY when the footer actually holds TIMESTAMP(NANOS)
    * (detected by the failed first read) — never as an unconditional side
    * effect that would change how every other file in the session reads. */
  def rawEvents(s: SparkSession, d: String): DataFrame =
    rawEventsWithNanosFlag(s, d)._1

  /** [[rawEvents]] plus WHETHER the column is TIMESTAMP(NANOS) — the
    * signal [[normalizeTs]] needs to tell a nanos-as-long column from a
    * plain un-annotated INT64, which would otherwise be silently divided
    * by 1000 (the exact corruption class this loader exists to refuse).
    * The detection reads the parquet FOOTER's logical-type annotation —
    * never the exception path alone: once the session-global nanos
    * legacy flag is set (by any earlier nanos load), later nanos files
    * read without error and an exception-based attestation would be
    * permanently lost for the rest of the session. */
  def rawEventsWithNanosFlag(s: SparkSession, d: String): (DataFrame, Boolean) = {
    val path = s"$d/events.parquet"
    val nanos = tsIsNanos(s, path)
    if (nanos) s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    (s.read.parquet(path), nanos)
  }

  /** True iff the file's `ts` column carries a TIMESTAMP(NANOS) logical
    * annotation in its footer. Memoized per (path, mtime, length): the
    * footer probe is a driver-side file open, and ~20 events-reading
    * queries per bench run each paying one is exactly the per-query
    * orchestration overhead that multiplies at scale. The mtime+length
    * key keeps the cache honest if the file is rewritten in place. */
  private val nanosCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), java.lang.Boolean]()

  private def tsIsNanos(s: SparkSession, path: String): Boolean = {
    val f = new java.io.File(path)
    // a directory-shaped parquet table (or a remote path) has no single
    // local mtime — fall through to the probe uncached in that rare case
    if (f.isFile) {
      val key = (path, f.lastModified(), f.length())
      nanosCache.computeIfAbsent(key, _ => Boolean.box(tsIsNanosUncached(s, path)))
    } else tsIsNanosUncached(s, path)
  }

  private def tsIsNanosUncached(s: SparkSession, path: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    // a directory-shaped table: probe the first part file's footer (one
    // writer ⇒ uniform schema across parts); the reader can't open a dir
    val f = new java.io.File(path)
    val probe =
      if (f.isDirectory)
        f.listFiles().filter(p => p.isFile && p.getName.endsWith(".parquet"))
          .map(_.getPath).sorted.headOption.getOrElse(path)
      else path
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(probe), s.sessionState.newHadoopConf()))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      schema.getFields.asScala.find(_.getName == "ts")
        .exists(_.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
    } finally reader.close()
  }

  /** Normalize a surfaced event-time column to session-zoned TimestampType:
    * raw long WITH the nanos flag (the caller attests the footer held
    * TIMESTAMP(NANOS)) → truncate to micros; TIMESTAMP_NTZ → reinterpret
    * in the session zone (UTC throughout this engine, matching how DuckDB
    * treats the same naive micros); TimestampType → pass through.
    * Anything else is a loud error — including a LongType column WITHOUT
    * the nanos attestation: a plain un-annotated INT64 could be seconds,
    * millis, micros or nanos, and guessing (the old `div 1000`) silently
    * compresses every timestamp 1000×. Silently coercing an unknown
    * encoding is how wrong answers ship. */
  def normalizeTs(df: DataFrame, colName: String = "ts",
                  nanosAsLong: Boolean = false): DataFrame =
    df.schema(colName).dataType match {
      case LongType if nanosAsLong =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case LongType => throw new IllegalArgumentException(
        s"events.$colName surfaced as a raw INT64 with no TIMESTAMP annotation — " +
          "its unit (s/ms/us/ns) is unknowable from the schema; refusing to guess. " +
          "Re-write the file with a logical timestamp type, or convert explicitly.")
      case TimestampNTZType => df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.$colName surfaced as unsupported type $other; expected " +
          "TIMESTAMP(NANOS)-as-long, timestamp_ntz, or timestamp")
    }
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
}
