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
  def events(s: SparkSession, d: String): DataFrame = normalizeTs(rawEvents(s, d))

  /** The events frame exactly as the parquet reader surfaces it, before
    * the `ts` normalization. The nanos-as-long legacy flag is session-global,
    * so it is set ONLY when the footer actually holds TIMESTAMP(NANOS)
    * (detected by the failed first read) — never as an unconditional side
    * effect that would change how every other file in the session reads. */
  def rawEvents(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    try s.read.parquet(path)
    catch {
      case e: Throwable if mentionsNanos(e) =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(path)
    }
  }

  private def mentionsNanos(e: Throwable): Boolean = {
    var t = e
    while (t != null) {
      if (t.getMessage != null && t.getMessage.contains("NANOS")) return true
      t = if (t.getCause eq t) null else t.getCause
    }
    false
  }

  /** Normalize a surfaced event-time column to session-zoned TimestampType:
    * raw long = nanos-as-long → truncate to micros; TIMESTAMP_NTZ →
    * reinterpret in the session zone (UTC throughout this engine, matching
    * how DuckDB treats the same naive micros); TimestampType → pass through.
    * Anything else is a loud error — silently coercing an unknown type is
    * how wrong answers ship. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType         => df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType => df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.$colName surfaced as unsupported type $other; expected long (nanos), timestamp_ntz, or timestamp")
    }
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
}
