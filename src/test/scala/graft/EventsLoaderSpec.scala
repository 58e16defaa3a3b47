package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loader contract: `Tables.events` and `EventsStream.readEvents` must
  * return the SAME logical rows no matter which physical parquet type the
  * writer chose for `ts`. The driver's testdata has shipped (across
  * generations) UTC-adjusted micros, naive micros (surfaced TIMESTAMP_NTZ),
  * and TIMESTAMP(NANOS) (which Spark can only surface as a raw long) — a
  * loader pinned to any one of them dies or silently corrupts on the next
  * writer version, which is exactly the failure mode 100 TB of files from
  * many writers makes routine. This spec writes the same five events under
  * all three encodings and asserts byte-identical normalized output.
  */
class EventsLoaderSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical logical rows: (event_id, ts in epoch MICROS, user_id,
    * event_type, value, props). Chosen off whole-second boundaries so a
    * unit mix-up (s/ms/us/ns) cannot cancel out. */
  private val rows = Seq(
    (1L, 1700000000123456L, 10L, "view",     1.50, """{"p":1}"""),
    (2L, 1700000000750000L, 10L, "purchase", 2.25, """{"p":2}"""),
    (3L, 1700003600000001L, 11L, "error",    0.00, """{"p":3}"""),
    (4L, 1700007199999999L, 11L, "view",     3.75, """{"p":4}"""),
    (5L, 1700010800500500L, 12L, "click",    0.25, """{"p":5}"""))

  /** Stage a Spark-written single parquet FILE at <dir>/events.parquet
    * (the testdata contract: one file per table, not a directory). */
  private def writeSparkFixture(tsType: org.apache.spark.sql.types.DataType): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_evfix").toString
    val tmp = s"$dir/_stage"
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(tsType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, Paths.get(s"$dir/events.parquet"))
    dir
  }

  /** Write a genuine TIMESTAMP(NANOS) footer via parquet-mr's example API
    * (Spark's own writer cannot produce NANOS). One row carries +999 ns
    * past its canonical micro so the floor-to-micros truncation — the same
    * floor DuckDB applies — is pinned, not just the happy path. */
  private def writeNanosFixture(): String = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val dir = java.nio.file.Files.createTempDirectory("graft_evfix_ns").toString
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  required binary event_type (UTF8);
        |  required double value;
        |  required binary props (UTF8);
        |}""".stripMargin)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    rows.foreach { case (id, us, uid, et, v, p) =>
      val extraNanos = if (id == 3L) 999L else 0L
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", us * 1000L + extraNanos)
      g.add("user_id", uid); g.add("event_type", et)
      g.add("value", v); g.add("props", p)
      writer.write(g)
    }
    writer.close()
    dir
  }

  private def canonical = rows.map { case (id, us, uid, et, v, p) => (id, us, uid, et, v, p) }.toSet

  private def normalized(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .as[(Long, Long, Long, String, Double, String)].collect().toSet

  test("batch loader normalizes all three physical ts encodings identically") {
    val utcDir = writeSparkFixture(TimestampType)
    val ntzDir = writeSparkFixture(TimestampNTZType)
    // micros fixtures first, with the nanos legacy flag in its default
    // state: loading them must NOT flip the session-global flag (the old
    // loader set it unconditionally — the footgun this spec pins away)
    val flagBefore = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    for (dir <- Seq(utcDir, ntzDir)) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"fixture $dir")
      assert(normalized(ev) == canonical, s"fixture $dir")
    }
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") == flagBefore,
      "loading a micros file must not touch the nanos-as-long session flag")
    val nsDir = writeNanosFixture()
    val ev = Tables.events(spark, nsDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(normalized(ev) == canonical,
      "nanos fixture must floor to the same micros (DuckDB's truncation)")
  }

  test("plain un-annotated INT64 ts is refused loudly, never unit-guessed") {
    // no logical timestamp annotation: the unit (s/ms/us/ns) is
    // unknowable from the schema — the loader must refuse, not divide
    // by 1000 and silently compress every timestamp (the corruption the
    // nanos-flag plumbing exists to prevent)
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.MessageTypeParser
    val dir = java.nio.file.Files.createTempDirectory("graft_evfix_raw").toString
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts;
        |  required int64 user_id;
        |  required binary event_type (UTF8);
        |  required double value;
        |  required binary props (UTF8);
        |}""".stripMargin)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    rows.foreach { case (id, us, uid, et, v, p) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", us)
      g.add("user_id", uid); g.add("event_type", et)
      g.add("value", v); g.add("props", p)
      writer.write(g)
    }
    writer.close()
    val ex = intercept[IllegalArgumentException] { Tables.events(spark, dir) }
    assert(ex.getMessage.contains("refusing to guess"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      graft.streaming.EventsStream.readEvents(spark, dir)
    }
    assert(ex2.getMessage.contains("refusing to guess"), ex2.getMessage)
  }

  test("streaming loader derives its schema from the footer and matches batch") {
    for (dir <- Seq(writeSparkFixture(TimestampType), writeSparkFixture(TimestampNTZType),
                    writeNanosFixture())) {
      val stream = graft.streaming.EventsStream.readEvents(spark, dir)
      assert(stream.isStreaming)
      assert(stream.schema("ts").dataType == TimestampType, s"fixture $dir")
      val landed = graft.streaming.EventsStream.drainToTable(
        spark, stream, s"evfix_${dir.replaceAll("[^A-Za-z0-9]", "")}", "append")
      assert(normalized(landed) == canonical, s"fixture $dir")
    }
  }
}
