package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._

/** Non-parquet ingestion: CSV and JSONL write→parse round trips must be
  * lossless on the content that breaks naive delimited-text handling —
  * embedded quotes, separators, record breaks (LF and CRLF), backslashes,
  * unicode, and NULLs — and malformed input must fail loudly, not
  * silently drop rows. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  // text values chosen to attack the CSV grammar: quote chars, the field
  // separator, LF and CRLF record breaks, backslashes (the default Spark
  // escape char — must NOT be treated as an escape under RFC-4180 "" mode),
  // and multi-byte unicode
  private lazy val gnarly = Seq(
    (1L, "plain words", "en", 11L),
    (2L, "comma, inside, fields", "de", 21L),
    (3L, "a \"quoted\" value", "es", 16L),
    (4L, "line\nbreak and\r\ncrlf", "fr", 20L),
    (5L, "back\\slash \\\" combo", "en", 19L),
    (6L, "unicode é—☃ 中文 ✓", "zh", 16L),
    (7L, "trailing space ", "de", 15L),
    (8L, "\"leads and trails\"", "es", 18L)
  ).toDF("doc_id", "text", "lang", "n_chars")

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text", "tricky", "lang_or_null", "n_chars", "score")
      .as[(Long, String, String, Option[String], Long, Double)]
      .collect().toSeq.sortBy(_._1)

  test("CSV round trip is lossless on quotes, separators, record breaks, unicode, NULLs") {
    val want = asTuples(Ingest.adversarialFrame(gnarly))
    val got = asTuples(Ingest.csvRoundTrip(spark, gnarly, "/tmp/ingest_spec_csv"))
    assert(got == want)
    // the NULL column really was null after the trip, not the string "null"
    assert(got.filter(_._4.isEmpty).map(_._1) == Seq(3L, 8L))
  }

  test("JSONL round trip is lossless on the same adversarial content") {
    val want = asTuples(Ingest.adversarialFrame(gnarly))
    val got = asTuples(Ingest.jsonlRoundTrip(spark, gnarly, "/tmp/ingest_spec_jsonl"))
    assert(got == want)
  }

  test("gzip JSONL: really gzip on disk, lossless through the codec") {
    val got = asTuples(Ingest.jsonlGzRoundTrip(spark, gnarly, "/tmp/ingest_spec_jgz"))
    assert(got == asTuples(Ingest.adversarialFrame(gnarly)))
    // the shards really are gzip (magic bytes), not plain text renamed
    val dir = new java.io.File(
      s"/tmp/graft_ingest_${spark.sparkContext.applicationId}_" +
        "_tmp_ingest_spec_jgz/jsonlgz")
    val shard = dir.listFiles().filter(_.getName.endsWith(".json.gz")).head
    val head = java.nio.file.Files.readAllBytes(shard.toPath).take(2)
    assert((head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b)
  }

  test("multiLine JSON arrays: one document per file, records span real newlines") {
    val got = asTuples(Ingest.jsonMultilineRoundTrip(spark, gnarly, "/tmp/ingest_spec_jarr"))
    assert(got == asTuples(Ingest.adversarialFrame(gnarly)))
    val dir = new java.io.File(
      s"/tmp/graft_ingest_${spark.sparkContext.applicationId}_" +
        "_tmp_ingest_spec_jarr/jsonarr")
    val f = dir.listFiles().filter(_.getName.endsWith(".json")).head
    val body = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    assert(body.trim.startsWith("[") && body.trim.endsWith("]"))
    assert(body.count(_ == '\n') > 2, "records must span real newlines")
    // a line-based reader CANNOT parse this shape: the default (JSONL)
    // read of the same dir must not reproduce the frame
    val lineRead = spark.read.schema(Ingest.roundTripSchema)
      .json(dir.toString)
    assert(lineRead.filter(col("doc_id").isNotNull).count() <
      Ingest.adversarialFrame(gnarly).count())
  }

  test("reads use the explicit schema, not inference") {
    val back = Ingest.csvRoundTrip(spark, gnarly, "/tmp/ingest_spec_schema")
    assert(back.schema == Ingest.roundTripSchema)
    val backJ = Ingest.jsonlRoundTrip(spark, gnarly, "/tmp/ingest_spec_schema_j")
    assert(backJ.schema == Ingest.roundTripSchema)
  }

  test("the writer emits multiple part files (multiLine CSV parallelism is per-file)") {
    Ingest.csvRoundTrip(spark, gnarly, "/tmp/ingest_spec_parts")
    val dir = new java.io.File(
      s"/tmp/graft_ingest_${spark.sparkContext.applicationId}_" +
        "_tmp_ingest_spec_parts/csv")
    assert(dir.listFiles().count(_.getName.endsWith(".csv")) > 1)
  }

  test("schema evolution: mergeSchema unions file schemas and null-fills the added column") {
    import org.apache.spark.sql.functions.col
    val back = Ingest.schemaEvolutionRoundTrip(spark, gnarly, "/tmp/ingest_spec_evolve")
      .select("doc_id", "lang").as[(Long, Option[String])].collect().toMap
    // v1 rows (even ids, landed before lang existed) read as null;
    // v2 rows carry their value
    assert(back(2L).isEmpty && back(4L).isEmpty)
    assert(back(1L).contains("en") && back(3L).contains("es"))
    // the trap the op exists to avoid: the DEFAULT read takes one file's
    // footer as the table schema, so the union schema is not guaranteed —
    // pin down that mergeSchema is what guarantees all four columns
    val dir = s"/tmp/graft_ingest_${spark.sparkContext.applicationId}_" +
      "_tmp_ingest_spec_evolve/evolve"
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "n_chars", "lang"))
    val plain = spark.read.parquet(dir)
    // whichever footer the default read sampled, relying on it is wrong:
    // either lang is silently missing, or only sampling luck provided it
    assert(plain.columns.toSet.subsetOf(merged.columns.toSet))
  }

  test("malformed JSONL fails loudly under FAILFAST instead of dropping rows") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_bad").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "part-00000.json").toPath,
      """{"doc_id": 1, "text": "ok"}""" + "\n" + """{"doc_id": BROKEN""" + "\n")
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(Ingest.roundTripSchema)
        .option("mode", "FAILFAST").json(dir.getAbsolutePath).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("dead-letter routing: exact quarantine membership, raw lines replayable") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Ingest.deadLetterIngest(spark, docs, "/root/testdata/sf0.001")
      .as[(Option[Long], Option[String], Option[Long], String, String)]
      .collect().toSeq
    assert(out.size == docs.count())
    val (bad, good) = out.partition(_._4 == "quarantined")
    // membership: exactly the planted %7==3 corruption
    val expectBad = docs.select("doc_id").as[Long].collect().filter(_ % 7 == 3).toSet
    assert(bad.map(_._5.stripPrefix("id-").takeWhile(_.isDigit).toLong).toSet == expectBad)
    // corrupt rows leak no parsed values; clean rows carry all of them
    assert(bad.forall(r => r._1.isEmpty && r._2.isEmpty && r._3.isEmpty))
    assert(good.forall(r => r._1.isDefined && r._2.isDefined && r._3.isDefined))
    // the quarantined raw line is replayable: strip the corruption and it
    // parses back to the original record
    bad.foreach { r =>
      val fixed = r._5.stripPrefix("id-").split(",", 3)
      assert(fixed.length == 3 && fixed(0).forall(_.isDigit))
    }
  }
}
