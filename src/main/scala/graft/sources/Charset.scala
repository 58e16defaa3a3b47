package graft.sources

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Charset-sniffing ingest — real corpora are NOT uniformly UTF-8 (the
  * reference reads UTF-8 only; a crawl ships UTF-16 office exports and
  * Latin-1 legacy pages side by side). Detection is the standard
  * two-stage sniff:
  *
  *   1. BOM: `EF BB BF` → UTF-8, `FF FE` → UTF-16LE, `FE FF` → UTF-16BE
  *      (the UTF-8 BOM is checked first — it cannot collide with the
  *      16-bit marks).
  *   2. No BOM: the NUL-parity sniff for BOM-LESS UTF-16 (zeros
  *      one-sided at odd offsets → LE, even → BE) — without it that
  *      wire form would land as NUL-riddled Latin-1 mojibake, silently;
  *   3. then strict UTF-8 decode (malformed bytes REPORT, not
  *      replace); on failure, Latin-1 — the only 8-bit map where every
  *      byte sequence is valid, so the fallback can never throw.
  *
  * The graded fixture encodes the SAME logical content (corpus text +
  * a Latin-1-encodable non-ASCII salt — `protégé`-class accents whose
  * lone `0xE9` bytes are invalid UTF-8) through all seven wire forms,
  * batched as one file per (partition × encoding) with one
  * `id<TAB>text` line per document and the BOM at file level — the
  * shape mixed corpora actually arrive in (mid-size uniformly-encoded
  * files, NOT a file per record). The reader must land every document
  * as identical UTF-8 text with a per-doc (file encoding, wire bytes)
  * report the oracle recomputes arithmetically from parquet.
  *
  * Scale shape: detection + decode is per-file map work over a
  * `binaryFile` scan — embarrassingly parallel, no shuffle before the
  * presentation sort; the unit of parallelism is the file, exactly how
  * mixed-encoding corpora arrive at 100 TB.
  */
object Charset {

  /** Latin-1-encodable non-ASCII salt appended to every document: é/ø/ß
    * map to single high bytes in Latin-1 (invalid as standalone UTF-8 —
    * the fallback trigger) and to multi-byte sequences in UTF-8 (the
    * valid-multibyte case the sniff must NOT misroute to Latin-1). */
  val Salt = " protégé Ærø ß°"

  val Encodings: Seq[String] =
    Seq("utf-8", "utf-8-bom", "utf-16le", "utf-16be", "latin-1",
      "utf-16le-nobom", "utf-16be-nobom")

  /** Deterministic wire encoding per document (mirrored by the oracle's
    * doc_id % 7 CASE). */
  def encodingOf(docId: Long): String = Encodings(((docId % 7) + 7).toInt % 7)

  /** Encode text for the wire, BOM included where the form carries one. */
  def encodeBytes(text: String, encoding: String): Array[Byte] = encoding match {
    case "utf-8" => text.getBytes(StandardCharsets.UTF_8)
    case "utf-8-bom" =>
      Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ text.getBytes(StandardCharsets.UTF_8)
    case "utf-16le" =>
      Array(0xFF.toByte, 0xFE.toByte) ++ text.getBytes(StandardCharsets.UTF_16LE)
    case "utf-16be" =>
      Array(0xFE.toByte, 0xFF.toByte) ++ text.getBytes(StandardCharsets.UTF_16BE)
    case "latin-1" => text.getBytes(StandardCharsets.ISO_8859_1)
    case "utf-16le-nobom" => text.getBytes(StandardCharsets.UTF_16LE)
    case "utf-16be-nobom" => text.getBytes(StandardCharsets.UTF_16BE)
    case other => throw new IllegalArgumentException(s"unknown encoding $other")
  }

  private def strictDecode(bytes: Array[Byte], from: Int,
                           cs: java.nio.charset.Charset): String =
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
      .decode(java.nio.ByteBuffer.wrap(bytes, from, bytes.length - from))
      .toString

  /** NUL-parity sniff for BOM-LESS UTF-16 — the one wire form the BOM +
    * strict-UTF-8 stages cannot see: without this check a BOM-less
    * UTF-16 export falls through to the Latin-1 branch and lands as
    * NUL-riddled mojibake, SILENTLY (the only wrong-text path that
    * neither throws nor mismatches a checksum). Latin-script UTF-16
    * puts a 0x00 high byte on (nearly) every code unit, so over the
    * first `window` bytes: NULs concentrated at ODD offsets → LE, at
    * EVEN offsets → BE — required to be one-sided (>1/4 of that parity
    * class NUL, ZERO in the other) so no UTF-8/Latin-1 text (which has
    * no NULs at all) or genuinely binary payload can trip it.
    * Deliberately out of scope: BOM-less UTF-16 of NUL-free scripts
    * (e.g. pure CJK, every high byte nonzero) — indistinguishable from
    * binary without a statistical language model. */
  private def sniffBomlessUtf16(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 4 || bytes.length % 2 != 0) return None
    val n = math.min(bytes.length, 64) & ~1
    var evenNul = 0; var oddNul = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 0) { if (i % 2 == 0) evenNul += 1 else oddNul += 1 }
      i += 1
    }
    val quorum = n / 8 // >1/4 of the 16-bit units in the window
    if (oddNul > quorum && evenNul == 0) Some("utf-16le-nobom")
    else if (evenNul > quorum && oddNul == 0) Some("utf-16be-nobom")
    else None
  }

  /** Sniff + decode: returns (detected encoding, UTF-8 text). BOM bytes
    * are consumed by detection, never leaked into the text. BOM-marked
    * and NUL-pattern-detected files decode STRICTLY (a declared or
    * detected encoding that doesn't decode is corrupt data — loud, not
    * mojibake); only the final no-signal path falls back to Latin-1. */
  def sniffDecode(bytes: Array[Byte]): (String, String) = {
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xEF &&
        (bytes(1) & 0xff) == 0xBB && (bytes(2) & 0xff) == 0xBF)
      ("utf-8-bom", strictDecode(bytes, 3, StandardCharsets.UTF_8))
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xFE)
      ("utf-16le", strictDecode(bytes, 2, StandardCharsets.UTF_16LE))
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xFE && (bytes(1) & 0xff) == 0xFF)
      ("utf-16be", strictDecode(bytes, 2, StandardCharsets.UTF_16BE))
    else sniffBomlessUtf16(bytes) match {
      case Some(enc) => (enc, strictDecode(bytes, 0, charsetOf(enc)))
      case None =>
        try ("utf-8", strictDecode(bytes, 0, StandardCharsets.UTF_8))
        catch { case _: CharacterCodingException =>
          ("latin-1", new String(bytes, StandardCharsets.ISO_8859_1))
        }
    }
  }

  /** The byte charset of a wire form (BOM handled separately). */
  def charsetOf(encoding: String): java.nio.charset.Charset = encoding match {
    case "utf-8" | "utf-8-bom" => StandardCharsets.UTF_8
    case "utf-16le" | "utf-16le-nobom" => StandardCharsets.UTF_16LE
    case "utf-16be" | "utf-16be-nobom" => StandardCharsets.UTF_16BE
    case "latin-1" => StandardCharsets.ISO_8859_1
    case other => throw new IllegalArgumentException(s"unknown encoding $other")
  }

  /** Land one uniformly-encoded file per (partition × encoding class),
    * one `id<TAB>text` line per document (the corpus carries no
    * tabs/newlines; a framing that needed them would use WARC). Files
    * are created lazily — a partition with no docs of a class writes
    * nothing. */
  def writeEncoded(spark: SparkSession, docs: DataFrame, sfDir: String): String = {
    val dir = Ingest.landingDir(spark, sfDir, "charset")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    docs.select(col("doc_id"), col("text"))
      .repartition(4, col("doc_id"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val outs = scala.collection.mutable.Map.empty[String, java.io.OutputStream]
        def outFor(enc: String): java.io.OutputStream = outs.getOrElseUpdate(enc, {
          val o = new java.io.BufferedOutputStream(java.nio.file.Files.newOutputStream(
            java.nio.file.Paths.get(dir, f"part-$pid%05d-$enc.txt")))
          o.write(encodeBytes("", enc)) // the file-level BOM (empty for BOM-less forms)
          o
        })
        try rows.foreach { r =>
          val docId = r.getLong(0)
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          val enc = encodingOf(docId)
          outFor(enc).write(s"$docId\t$text\n".getBytes(charsetOf(enc)))
        } finally outs.values.foreach(_.close())
      }
    dir
  }

  /** One sniffed document (public: the Dataset encoder's codegen must
    * be able to construct it — a private case class silently drops the
    * whole projection to interpreted mode). */
  final case class Sniffed(doc_id: Long, encoding: String,
                           n_bytes: Long, n_chars: Long, text: String)

  /** Read a mixed-encoding landing dir into the graded frame:
    * (doc_id, encoding, n_bytes, n_chars, text) — sniff + decode once
    * per FILE, then per-line framing; n_bytes is the document text's
    * wire size under the file's charset (the BOM is file overhead, not
    * the document's), text landed as uniform UTF-8 whatever the wire
    * form was. */
  def readSniffed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.txt")
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val (enc, whole) = sniffDecode(bytes)
        val cs = charsetOf(enc)
        whole.split("\n", -1).iterator.filter(_.nonEmpty).map { line =>
          val tab = line.indexOf('\t')
          require(tab > 0, s"malformed charset-landing line: '${line.take(40)}'")
          val text = line.substring(tab + 1)
          Sniffed(line.substring(0, tab).toLong, enc,
            text.getBytes(cs).length.toLong,
            text.codePointCount(0, text.length).toLong, text)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** The graded cross-encoding round trip over the salted corpus. */
  def roundTrip(spark: SparkSession, docs: DataFrame, sfDir: String): DataFrame =
    readSniffed(spark, writeEncoded(spark,
      docs.withColumn("text", concat(col("text"), lit(Salt))), sfDir))
}
