package graft

import org.apache.spark.sql.functions._
import graft.sources.{Avro, Ingest}

/** Avro OCF round trip: union nulls, reader-schema projection, the
  * multi-block container walk, and loud failure on truncation. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val dir = Avro.writeCorpus(spark, docs, sf)

  test("round trip is lossless incl. union nulls and adversarial strings") {
    val back = Avro.readCorpus(spark, dir)
    val want = Ingest.adversarialFrame(docs)
    assert(back.count() == want.count())
    assert(back.exceptAll(want).count() == 0)
    assert(want.exceptAll(back).count() == 0)
    // the ["null","string"] union landed as true SQL NULLs, and the
    // es-rows are exactly the null set
    assert(back.filter(col("lang_or_null").isNull).count() ==
      docs.filter(col("lang") === "es").count())
  }

  test("reader-schema projection agrees with the full read") {
    val proj = Avro.readProjected(spark, dir)
    val full = Avro.readCorpus(spark, dir).select("doc_id", "n_chars")
    assert(proj.exceptAll(full).count() == 0)
    assert(full.exceptAll(proj).count() == 0)
  }

  test("containers span all four codecs and carry multiple blocks each") {
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".avro")).iterator()
    val seen = scala.collection.mutable.Map.empty[String, Long]
    while (files.hasNext) {
      val bytes = java.nio.file.Files.readAllBytes(files.next())
      val r = new org.apache.avro.file.DataFileReader(
        new org.apache.avro.file.SeekableByteArrayInput(bytes),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val codec = Option(r.getMetaString("avro.codec")).getOrElse("null")
      var blocks = 0L
      while (r.hasNext) { blocks += 1; r.nextBlock() }
      r.close()
      assert(blocks >= 2, s"$codec container not multi-block ($blocks)")
      seen(codec) = seen.getOrElse(codec, 0L) + 1
    }
    // the mixed-codec lake is real: every codec class landed at least once
    assert(seen.keySet == Set("deflate", "snappy", "zstandard", "null"), seen)
  }

  test("truncation: avro core is silent, validateContainer is loud") {
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".avro")).findFirst().get()
    val bytes = java.nio.file.Files.readAllBytes(f)
    assert(Avro.validateContainer(bytes) >= 2) // intact file: many blocks
    val cut = java.util.Arrays.copyOf(bytes, bytes.length / 2)
    // the HAZARD the validator exists for: DataFileStream.hasNext
    // swallows EOF, so avro core can drain a truncated container
    // cleanly and pass off the prefix as the whole dataset
    val r = new org.apache.avro.file.DataFileReader(
      new org.apache.avro.file.SeekableByteArrayInput(cut),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val core = try {
      var n = 0L; while (r.hasNext) { r.next(); n += 1 }; Right(n)
    } catch { case e: Exception => Left(e.getClass.getSimpleName) }
    // either silent-short (the dangerous case) or an exception —
    // never the full row count
    assert(core != Right(Avro.readCorpus(spark, dir).count()))
    // the product reader's guard: structural walk fails loudly
    val e = intercept[IllegalArgumentException](Avro.validateContainer(cut))
    assert(e.getMessage.contains("truncated avro"))
    // and a flipped sync marker is caught too
    val flipped = bytes.clone()
    flipped(bytes.length - 3) = (flipped(bytes.length - 3) ^ 0x5a).toByte
    val e2 = intercept[IllegalArgumentException](Avro.validateContainer(flipped))
    assert(e2.getMessage.contains("sync marker mismatch"))
  }
}
