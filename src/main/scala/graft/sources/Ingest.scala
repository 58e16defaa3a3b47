package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet ingestion formats, graded end-to-end: a corpus derived from
  * the documents table — salted with the content that breaks naive
  * delimited-text handling (embedded quotes, field separators, record
  * separators, unicode, NULLs) — is written through the engine's CSV /
  * JSONL sinks and read back through the matching sources. The graded
  * claim is the full write→parse round trip: the DuckDB oracle computes
  * the same frame straight from the parquet table, so any quoting,
  * escaping, null-encoding, or charset fault in either direction
  * hash-mismatches.
  *
  * Scale design: reads always pass an EXPLICIT schema — `spark.read`
  * without one runs a distributed inference pass over every byte of the
  * corpus before the real scan (2× the I/O at 100 TB). Parse mode is
  * FAILFAST here because the fixture is engine-written (a malformed row
  * is an engine bug and must be loud); a crawl ingest would use
  * PERMISSIVE + `columnNameOfCorruptRecord` so bad rows land in a graded
  * quarantine column instead of killing the stage. Note multiLine CSV
  * (required once text carries record separators) makes a FILE the unit
  * of parallelism — at scale, land many mid-size files, not one giant
  * one (the writer below emits multiple parts for exactly that reason).
  */
object Ingest {

  /** The round-trip payload: documents plus a `tricky` column packing a
    * double-quote, the CSV field separator, a record separator, and
    * non-ASCII into one value, and a sometimes-NULL column. */
  def adversarialFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text"),
      concat(lit("q\""), substring(col("text"), 1, 10), lit("\",\n"),
        col("lang"), lit("é—☃")).as("tricky"),
      expr("nullif(lang, 'es')").as("lang_or_null"),
      col("n_chars"),
      (col("n_chars") / 4.0).as("score"))

  /** Explicit read schema for the round trip (never inferred). */
  val roundTripSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("tricky", StringType),
    StructField("lang_or_null", StringType),
    StructField("n_chars", LongType),
    StructField("score", DoubleType)))

  /** Stable landing dir per (session, sfDir, format), wiped before each
    * write: repeated bench passes stay bounded at one copy, and the
    * applicationId component keeps concurrent sessions on the same sfDir
    * from clobbering each other. */
  private[sources] def landingDir(spark: SparkSession, sfDir: String, format: String): String = {
    import java.nio.file.{Files, Path, Paths}
    val out = Paths.get(
      s"/tmp/graft_ingest_${spark.sparkContext.applicationId}_" +
        s"${sfDir.replaceAll("[^A-Za-z0-9]", "_")}/$format")
    graft.Dirs.deleteRecursively(out)
    out.toString
  }

  /** Dead-letter ingest: land a CSV batch with deterministically
    * corrupted lines (every `doc_id % 7 == 3` row carries a non-numeric
    * id field), parse in PERMISSIVE mode with a corrupt-record column,
    * and route every line to exactly one side — clean rows with their
    * parsed fields, quarantined rows with the RAW line preserved for
    * replay. Production's answer to a feed where FAILFAST kills the job
    * on one bad line and DROPMALFORMED silently eats data: the graded
    * claim is the exact quarantine membership, the untouched raw
    * payloads, and that parsed values never leak out of a corrupt row.
    *
    * Scale shape: one text write + one schema-pinned CSV scan; the
    * routing is a per-row projection (no shuffle beyond the
    * presentation sort). Columns: doc_id, lang, n_chars (null on the
    * quarantine side), status, raw (the original line on both sides —
    * reconstructed losslessly for clean rows, the corrupt column's
    * verbatim capture for quarantined ones). */
  def deadLetterIngest(spark: SparkSession, docs: DataFrame, sfDir: String): DataFrame = {
    val path = landingDir(spark, sfDir, "deadletter")
    docs.select(concat_ws(",",
        when(col("doc_id") % 7 === 3, concat(lit("id-"), col("doc_id").cast("string")))
          .otherwise(col("doc_id").cast("string")),
        coalesce(col("lang"), lit("xx")),
        col("n_chars").cast("string")).as("value"))
      .repartition(4)
      .write.text(path)
    val parsed = spark.read
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("lang", StringType),
        StructField("n_chars", LongType),
        StructField("_corrupt_record", StringType))))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
    val clean = col("_corrupt_record").isNull
    parsed.select(
        when(clean, col("doc_id")).as("doc_id"),
        when(clean, col("lang")).as("lang"),
        when(clean, col("n_chars")).as("n_chars"),
        when(clean, lit("clean")).otherwise(lit("quarantined")).as("status"),
        coalesce(col("_corrupt_record"),
          concat_ws(",", col("doc_id").cast("string"), col("lang"),
            col("n_chars").cast("string"))).as("raw"))
      .orderBy("raw")
  }

  /** Write the corpus as RFC-4180-style CSV (header, `"`-escaped quotes
    * so quoted-quote handling is exercised, not Spark's default
    * backslash escape) and read it back with the explicit schema.
    * multiLine is required on read: `text`/`tricky` carry embedded
    * newlines, so records span lines. */
  def csvRoundTrip(spark: SparkSession, docs: DataFrame, sfDir: String): DataFrame = {
    val path = landingDir(spark, sfDir, "csv")
    // ignore*WhiteSpace default to TRUE on the WRITE side: Spark's CSV
    // writer silently trims leading/trailing spaces out of field values
    // unless told not to — a lossy default the round-trip grade exists
    // to catch. Disabled on both sides.
    adversarialFrame(docs)
      .repartition(4) // multiLine CSV parallelism is per-file: emit several
      .write.option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
    spark.read.schema(roundTripSchema)
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("multiLine", "true").option("mode", "FAILFAST")
      .csv(path)
      .orderBy("doc_id")
  }

  /** ORC round trip — the columnar sibling of the parquet lake (the
    * format half of Hive-lineage warehouses still speak): the same
    * adversarial frame (embedded quotes/newlines/unicode, a null-bearing
    * column, doubles) written as ORC and read back under the explicit
    * schema, with a selective predicate that must reach the ORC scan as
    * a pushed filter (PlanSpec-asserted — ORC carries min/max stripe
    * stats exactly so scans can skip stripes at 100 TB). */
  def orcRoundTrip(spark: SparkSession, docs: DataFrame, sfDir: String,
                   minChars: Long = 120L): DataFrame = {
    val path = landingDir(spark, sfDir, "orc")
    adversarialFrame(docs).repartition(4).write.orc(path)
    spark.read.schema(roundTripSchema).orc(path)
      .filter(col("n_chars") >= minChars)
      .orderBy("doc_id")
  }

  /** Schema evolution across ingest generations: an early batch landed
    * WITHOUT the `lang` column (v1 schema), a later batch WITH it (v2) —
    * the standard shape of a long-lived table whose producer grew a
    * field. Read back under `mergeSchema=true`, which unions the file
    * schemas and null-fills the missing column for v1 rows.
    *
    * The default read is the trap this query pins down: without
    * mergeSchema, Spark takes ONE file's footer as the table schema, so
    * whether `lang` exists at all depends on which file is sampled —
    * silent, nondeterministic column loss (IngestSpec demonstrates it).
    * At scale, footer-merging costs one distributed pass over file
    * footers; tables with settled schemas should pin an explicit schema
    * instead and skip both the merge and the trap. */
  def schemaEvolutionRoundTrip(spark: SparkSession, docs: DataFrame,
                               sfDir: String): DataFrame = {
    val path = landingDir(spark, sfDir, "evolve")
    docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text", "n_chars")
      .write.mode("append").parquet(path)
    docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text", "n_chars", "lang")
      .write.mode("append").parquet(path)
    spark.read.option("mergeSchema", "true").parquet(path)
      .select("doc_id", "text", "n_chars", "lang")
      .orderBy("doc_id")
  }

  /** Write the corpus as JSONL (one object per line — newlines and
    * quotes inside values are `\`-escaped by the JSON grammar itself)
    * and read it back with the explicit schema. */
  def jsonlRoundTrip(spark: SparkSession, docs: DataFrame, sfDir: String): DataFrame = {
    val path = landingDir(spark, sfDir, "jsonl")
    adversarialFrame(docs)
      .repartition(4)
      .write.json(path)
    spark.read.schema(roundTripSchema)
      .option("mode", "FAILFAST")
      .json(path)
      .orderBy("doc_id")
  }

  /** GZIP-compressed JSONL round trip — the wire shape 100-TB text
    * corpora actually ship (per-shard .json.gz): the WRITE lands
    * gzip-coded shards via the output codec, the read decompresses by
    * file extension. The scale caveat is the point and is documented
    * here deliberately: gzip is NOT splittable, so one shard = one task
    * whatever its size — shard sizing (many mid-size files) is the
    * parallelism knob, exactly how this writer lands 4 shards. Framing
    * adversarial content is the same JSONL escape grammar. */
  def jsonlGzRoundTrip(spark: SparkSession, docs: DataFrame, sfDir: String): DataFrame = {
    val path = landingDir(spark, sfDir, "jsonlgz")
    adversarialFrame(docs)
      .repartition(4)
      .write.option("compression", "gzip").json(path)
    val files = new java.io.File(path).listFiles()
    require(files != null && files.exists(_.getName.endsWith(".json.gz")),
      "landing must be .json.gz shards")
    spark.read.schema(roundTripSchema)
      .option("mode", "FAILFAST")
      .json(path)
      .orderBy("doc_id")
  }

  /** MULTI-LINE JSON round trip — whole-file JSON ARRAYS (the API-dump
    * wire shape: one `[ {...}, {...} ]` document per file, records
    * spanning lines), NOT line-delimited. Spark must parse each file as
    * ONE document (`multiLine`), so like gzip the file is the unit of
    * parallelism — the writer lands one array per partition for
    * exactly that reason. Pretty-printed with real newlines inside the
    * array so a line-based reader cannot fake it. */
  def jsonMultilineRoundTrip(spark: SparkSession, docs: DataFrame,
                             sfDir: String): DataFrame = {
    val path = landingDir(spark, sfDir, "jsonarr")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    adversarialFrame(docs)
      .repartition(4, col("doc_id"))
      .toJSON
      .foreachPartition { (rows: Iterator[String]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val target = java.nio.file.Paths.get(path, f"part-$pid%05d.json")
        val w = java.nio.file.Files.newBufferedWriter(target)
        try {
          w.write("[\n")
          var first = true
          rows.foreach { r =>
            if (!first) w.write(",\n")
            // break each record across TWO lines (after the opening
            // brace) — a line-based JSONL reader then sees invalid JSON
            // on every line; only a true multiLine parse recovers
            w.write("  {\n    "); w.write(r.substring(1))
            first = false
          }
          w.write("\n]\n")
        } finally w.close()
      }
    spark.read.schema(roundTripSchema)
      .option("multiLine", "true")
      .json(path)
      .orderBy("doc_id")
  }
}
