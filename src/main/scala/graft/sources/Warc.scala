package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingest — the container format a crawl-scale corpus
  * actually arrives in. Records are framed as a CRLF-terminated header
  * block (`WARC/1.0`, `Name: value` fields) and a `Content-Length`-sized
  * payload block, closed by CRLF CRLF; the byte-length framing is what
  * makes the format robust to ANY payload content (record separators,
  * quotes, unicode — nothing needs escaping), which is exactly what the
  * graded round trip exercises: the corpus is written through
  * [[writeCorpus]] (responses interleaved with `warcinfo` records the
  * reader must skip) and parsed back through [[readCorpus]], and the
  * oracle computes the same frame straight from parquet — any framing,
  * charset, or header fault on either side hash-mismatches.
  *
  * Scale design: WARC's unit of parallelism is the FILE (records are not
  * splittable without an index), so the writer lands one mid-size file
  * per partition — the same discipline as the multiLine CSV sink. The
  * reader here goes through `binaryFile` (whole-file bytes per row, the
  * right tool at fixture scale and for crawl archives sized to the
  * conventional ~1 GB); the record walker itself is a pure
  * bytes→records function, so a petabyte deployment swaps the file
  * loader for a streaming `FSDataInputStream` iterator without touching
  * the parsing or the plan shape (one scan, no shuffle before the
  * presentation sort).
  */
object Warc {

  private val Crlf = "\r\n"

  /** One WARC record as raw bytes: version line, the given header
    * fields, `Content-Length` computed from the payload, blank line,
    * payload, CRLF CRLF record terminator. */
  def recordBytes(warcType: String, headers: Seq[(String, String)],
                  payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: ").append(warcType).append(Crlf)
    headers.foreach { case (k, v) => head.append(k).append(": ").append(v).append(Crlf) }
    head.append("Content-Length: ").append(payload.length).append(Crlf)
    head.append(Crlf)
    val hb = head.toString.getBytes(UTF_8)
    val out = new Array[Byte](hb.length + payload.length + 4)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(payload, 0, out, hb.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** The deterministic Target-URI of a document (mirrored by the
    * oracle's string concat). */
  def uriOf(source: String, docId: Long): String =
    s"https://$source.example/$docId"

  /** Land the documents as WARC files, one per partition: a leading
    * `warcinfo` record (which [[readCorpus]] must skip), then one
    * `response` record per document — payload is the raw UTF-8 text,
    * language carried as a conformant extension header. `wrap` encodes
    * each record for the wire (identity for plain WARC; one gzip member
    * per record for `.warc.gz`). */
  private def writeCorpusImpl(spark: SparkSession, docs: DataFrame, sfDir: String,
                              format: String, fileExt: String,
                              wrap: Array[Byte] => Array[Byte]): String = {
    val dir = Ingest.landingDir(spark, sfDir, format)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .repartition(4, col("doc_id"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = java.nio.file.Paths.get(dir, f"part-$pid%05d.$fileExt")
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(path))
        try {
          out.write(wrap(recordBytes("warcinfo",
            Seq("WARC-Filename" -> path.getFileName.toString,
              "Content-Type" -> "application/warc-fields"),
            s"software: graft$Crlf".getBytes(UTF_8))))
          rows.foreach { r =>
            val docId = r.getLong(0)
            val text = if (r.isNullAt(1)) "" else r.getString(1)
            val lang = if (r.isNullAt(2)) "" else r.getString(2)
            val source = if (r.isNullAt(3)) "" else r.getString(3)
            out.write(wrap(recordBytes("response",
              Seq("WARC-Target-URI" -> uriOf(source, docId),
                "WARC-Date" -> "2026-01-01T00:00:00Z",
                "WARC-Graft-Lang" -> lang,
                "Content-Type" -> "text/plain; charset=utf-8"),
              text.getBytes(UTF_8))))
          }
        } finally out.close()
      }
    dir
  }

  def writeCorpus(spark: SparkSession, docs: DataFrame, sfDir: String): String =
    writeCorpusImpl(spark, docs, sfDir, "warc", "warc", identity)

  /** Land the documents as `.warc.gz`: each record its OWN gzip member
    * (the CommonCrawl convention — per-record members are what make a
    * crawl archive seekable at record granularity without decompressing
    * the whole file; a member index turns the format splittable). */
  def writeCorpusGz(spark: SparkSession, docs: DataFrame, sfDir: String): String =
    writeCorpusImpl(spark, docs, sfDir, "warc_gz", "warc.gz", gzipMemberBytes)

  /** One parsed response record. */
  final case class WarcResponse(uri: String, lang: String, payload: Array[Byte])

  /** Walk a WARC file's bytes into its records, keeping `response`
    * types. Framing is enforced loudly (FAILFAST semantics — the
    * fixture is engine-written, so a bad frame is an engine bug):
    * every record must open with the version line, carry an integer
    * `Content-Length`, and close with CRLF CRLF. */
  def parseRecords(bytes: Array[Byte]): Iterator[WarcResponse] = new Iterator[WarcResponse] {
    private var pos = 0
    private var nextRec: WarcResponse = _
    advance()

    private def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length && !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      require(pos + 1 < bytes.length, s"unterminated header line at byte $start")
      val s = new String(bytes, start, pos - start, UTF_8)
      pos += 2
      s
    }

    @annotation.tailrec
    private def advance(): Unit = {
      nextRec = null
      if (pos < bytes.length) {
        val version = line()
        require(version.startsWith("WARC/"), s"expected WARC version line, got '$version'")
        var warcType, uri, lang = ""
        var contentLength = -1L
        var h = line()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"malformed header '$h'")
          val (k, v) = (h.substring(0, i).trim, h.substring(i + 1).trim)
          k.toLowerCase match {
            case "warc-type" => warcType = v
            case "warc-target-uri" => uri = v
            case "warc-graft-lang" => lang = v
            case "content-length" => contentLength = v.toLong
            case _ => ()
          }
          h = line()
        }
        require(contentLength >= 0, "record missing Content-Length")
        require(pos + contentLength + 4 <= bytes.length,
          s"payload overruns file: need ${contentLength + 4} bytes at $pos")
        val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + contentLength.toInt)
        pos += contentLength.toInt
        require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
          bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
          s"record not CRLF CRLF terminated at byte $pos")
        pos += 4
        if (warcType == "response") nextRec = WarcResponse(uri, lang, payload)
        else advance() // skip warcinfo/request/metadata records
      }
    }

    override def hasNext: Boolean = nextRec != null
    override def next(): WarcResponse = {
      val r = nextRec; advance(); r
    }
  }

  // ------------------------------------------------------ gzip members

  /** One RFC 1952 gzip member around `payload`: fixed 10-byte header
    * (deflate, no flags, MTIME 0, OS 255), raw-deflate body, CRC32 +
    * ISIZE little-endian trailer. Deterministic for a given payload. */
  def gzipMemberBytes(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 32)
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    defl.setInput(payload); defl.finish()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    def le32(v: Long): Unit = (0 to 3).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    le32(crc.getValue); le32(payload.length.toLong & 0xffffffffL)
    bos.toByteArray
  }

  /** Decode the gzip member starting at `start`: full header walk
    * (FEXTRA/FNAME/FCOMMENT/FHCRC tolerated even though our writer
    * emits none), raw `Inflater` over the deflate body — the same
    * decoder the PNG IDAT path uses, minus the zlib wrapper — then the
    * trailer's CRC32 and ISIZE verified against the inflated bytes.
    * Returns (payload, bytes consumed). Loud on any corruption: a
    * flipped body byte throws DataFormatException, a flipped trailer
    * byte fails the CRC/ISIZE require — a crawl reader that skips
    * trailer checks ships silently-truncated documents. */
  private def gzipMemberAt(bytes: Array[Byte], start: Int): (Array[Byte], Int) = {
    var pos = start
    require(pos + 10 <= bytes.length, s"truncated gzip header at byte $pos")
    require((bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
      s"bad gzip magic at byte $pos")
    require(bytes(pos + 2) == 8, s"unsupported gzip method ${bytes(pos + 2)}")
    val flg = bytes(pos + 3) & 0xff
    pos += 10
    if ((flg & 4) != 0) { // FEXTRA
      require(pos + 2 <= bytes.length, s"truncated gzip FEXTRA length at byte $pos")
      val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
      pos += 2 + xlen
      require(pos <= bytes.length, s"truncated gzip FEXTRA field at byte $pos")
    }
    def skipNulTerminated(field: String): Unit = { // FNAME / FCOMMENT
      while (pos < bytes.length && bytes(pos) != 0) pos += 1
      require(pos < bytes.length, s"truncated gzip $field at byte $pos")
      pos += 1
    }
    if ((flg & 8) != 0) skipNulTerminated("FNAME")
    if ((flg & 16) != 0) skipNulTerminated("FCOMMENT")
    if ((flg & 2) != 0) { // FHCRC
      pos += 2
      require(pos <= bytes.length, s"truncated gzip FHCRC at byte $pos")
    }
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(bytes, pos, bytes.length - pos)
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) require(inf.finished(), s"truncated deflate body at byte $pos")
        else out.write(buf, 0, n)
      }
      val data = out.toByteArray
      val tpos = pos + inf.getBytesRead.toInt
      require(tpos + 8 <= bytes.length, s"truncated gzip trailer at byte $tpos")
      def le32(p: Int): Long = (0 to 3).map(i => (bytes(p + i) & 0xffL) << (8 * i)).sum
      val crc = new java.util.zip.CRC32(); crc.update(data)
      require(le32(tpos) == crc.getValue, s"gzip member CRC mismatch at byte $tpos")
      require(le32(tpos + 4) == (data.length.toLong & 0xffffffffL),
        s"gzip member ISIZE mismatch at byte ${tpos + 4}")
      (data, tpos + 8 - start)
    } finally inf.end()
  }

  /** Walk a `.warc.gz` file's concatenated gzip members. */
  def parseGzipMembers(bytes: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var pos = 0
    override def hasNext: Boolean = pos < bytes.length
    override def next(): Array[Byte] = {
      val (data, consumed) = gzipMemberAt(bytes, pos)
      pos += consumed
      data
    }
  }

  /** The shared bytes→graded-frame projection. */
  private def corpusFrame(records: org.apache.spark.sql.Dataset[WarcResponse]): DataFrame =
    records.select(
        substring_index(col("uri"), "/", -1).cast("long").as("doc_id"),
        col("uri").as("url"),
        col("lang"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("payload").cast("string").as("text"))
      .orderBy("doc_id")

  /** Read a WARC landing dir back into the graded frame:
    * (doc_id, url, lang, n_bytes, text), doc_id recovered from the
    * Target-URI tail, n_bytes the Content-Length-framed payload size. */
  def readCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusFrame(spark.read.format("binaryFile").load(s"$dir/*.warc")
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseRecords)))
  }

  /** Read a `.warc.gz` landing dir: member walk → per-member record
    * framing → the same graded frame as [[readCorpus]]. */
  def readCorpusGz(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusFrame(spark.read.format("binaryFile").load(s"$dir/*.warc.gz")
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(b => parseGzipMembers(b).flatMap(parseRecords))))
  }

  /** Payload salt appended to every document before writing: CRLFs and
    * a verbatim `WARC/1.0` version-line LOOKALIKE inside the payload,
    * plus non-ASCII (so Content-Length counts bytes, not chars). A
    * parser that scans for record boundaries instead of honoring the
    * byte-length framing splits mid-payload and hash-mismatches. */
  val PayloadSalt = "\r\nWARC/1.0\r\n☃é—"

  /** The graded write→parse round trip over the salted payloads. */
  def roundTrip(spark: SparkSession, docs: DataFrame, sfDir: String): DataFrame =
    readCorpus(spark, writeCorpus(spark,
      docs.withColumn("text", concat(col("text"), lit(PayloadSalt))), sfDir))

  /** The gzip round trip: the SAME salted payloads (the lookalike
    * `WARC/1.0` version line now rides INSIDE a compressed body), each
    * record its own verified gzip member. */
  def roundTripGz(spark: SparkSession, docs: DataFrame, sfDir: String): DataFrame =
    readCorpusGz(spark, writeCorpusGz(spark,
      docs.withColumn("text", concat(col("text"), lit(PayloadSalt))), sfDir))
}
