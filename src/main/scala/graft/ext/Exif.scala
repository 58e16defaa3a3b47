package graft.ext

import java.nio.charset.StandardCharsets.US_ASCII

/** JPEG EXIF (APP1) metadata — the most common image-metadata carrier
  * on the web (camera make/model, orientation, timestamps), completing
  * the metadata family next to PNG tEXt, WAV INFO and MP4 headers.
  *
  * An EXIF block is a TIFF file embedded in a JPEG APP1 segment:
  * `FF E1 <len> "Exif\0\0"` then a TIFF header — 2-byte byte-order mark
  * (`II` little / `MM` big endian), the magic 42, the IFD0 offset — and
  * IFD0 itself: an entry count, 12-byte entries (tag, type, count,
  * value-or-offset; values ≤ 4 bytes are inlined LEFT-JUSTIFIED in the
  * offset field), a next-IFD pointer. BOTH byte orders are real on the
  * wire (Intel vs Motorola camera lineages), so the fixture plants both.
  *
  * Degradation contract (same as every codec here): structural
  * corruption — truncated IFD, value offset past the block, a count
  * that overruns — yields None (no rows), never an exception; an
  * UNKNOWN value type skips that entry only (real files carry maker
  * types this walker doesn't grade).
  *
  * Scale shape: per-payload map work inside the existing partition-wise
  * media decode — no shuffle, no driver involvement.
  */
object Exif {

  /** Typed IFD values (the graded subset: ASCII / SHORT / LONG /
    * RATIONAL — types 2/3/4/5). */
  sealed trait Value
  final case class Ascii(s: String) extends Value
  final case class Shorts(vs: Seq[Int]) extends Value
  final case class Longs(vs: Seq[Long]) extends Value
  final case class Rational(num: Long, den: Long) extends Value

  final case class Entry(tag: Int, value: Value)

  private def typeOf(v: Value): Int = v match {
    case _: Ascii => 2; case _: Shorts => 3; case _: Longs => 4; case _: Rational => 5
  }
  private def countOf(v: Value): Int = v match {
    case Ascii(s) => s.length + 1 // trailing NUL
    case Shorts(vs) => vs.length
    case Longs(vs) => vs.length
    case _: Rational => 1
  }
  /** Serialize one value in the given byte order. */
  private def valueBytes(v: Value, le: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def p16(x: Int): Unit =
      if (le) { out.write(x & 0xFF); out.write((x >> 8) & 0xFF) }
      else { out.write((x >> 8) & 0xFF); out.write(x & 0xFF) }
    def p32(x: Long): Unit =
      if (le) (0 to 3).foreach(i => out.write(((x >> (8 * i)) & 0xFF).toInt))
      else (3 to 0 by -1).foreach(i => out.write(((x >> (8 * i)) & 0xFF).toInt))
    v match {
      case Ascii(s) => out.write(s.getBytes(US_ASCII)); out.write(0)
      case Shorts(vs) => vs.foreach(p16)
      case Longs(vs) => vs.foreach(p32)
      case Rational(n, d) => p32(n); p32(d)
    }
    out.toByteArray
  }

  /** The Exif-IFD pointer tag (TIFF/EP 0x8769): IFD0 carries it as a
    * LONG whose value is the absolute offset of the Exif SUB-IFD —
    * where cameras put most capture metadata. */
  val ExifIfdPointer = 0x8769

  def tiffBytes(littleEndian: Boolean, entries: Seq[Entry],
                subEntries: Seq[Entry] = Nil): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def p16(x: Int): Unit =
      if (littleEndian) { out.write(x & 0xFF); out.write((x >> 8) & 0xFF) }
      else { out.write((x >> 8) & 0xFF); out.write(x & 0xFF) }
    def p32(x: Long): Unit =
      if (littleEndian) (0 to 3).foreach(i => out.write(((x >> (8 * i)) & 0xFF).toInt))
      else (3 to 0 by -1).foreach(i => out.write(((x >> (8 * i)) & 0xFF).toInt))
    def spillLen(es: Seq[Entry]): Int =
      es.map(e => valueBytes(e.value, littleEndian).length).filter(_ > 4).sum
    // IFD0 entry set: the caller's tags plus (when a sub-IFD exists)
    // the 0x8769 pointer, in ascending tag order as TIFF requires
    val sub = subEntries.sortBy(_.tag)
    val subOffset = // IFD0 starts at 8; sub-IFD follows IFD0's spill area
      if (sub.isEmpty) 0L
      else 8L + 2 + 12 * (entries.length + 1) + 4 + spillLen(entries)
    val es = (if (sub.isEmpty) entries
              else entries :+ Entry(ExifIfdPointer, Longs(Seq(subOffset))))
      .sortBy(_.tag)
    // header: byte-order mark, 42, IFD0 at offset 8
    out.write(if (littleEndian) 'I' else 'M'); out.write(if (littleEndian) 'I' else 'M')
    p16(42); p32(8L)
    def writeIfd(ifdEs: Seq[Entry], ifdStart: Int): Unit = {
      p16(ifdEs.length)
      var spill = ifdStart + 2 + 12 * ifdEs.length + 4
      val area = new java.io.ByteArrayOutputStream()
      ifdEs.foreach { e =>
        p16(e.tag); p16(typeOf(e.value)); p32(countOf(e.value).toLong)
        val vb = valueBytes(e.value, littleEndian)
        if (vb.length <= 4) { out.write(vb); (vb.length until 4).foreach(_ => out.write(0)) }
        else { p32(spill.toLong); area.write(vb); spill += vb.length }
      }
      p32(0L)
      out.write(area.toByteArray)
    }
    writeIfd(es, 8)
    if (sub.nonEmpty) writeIfd(sub, subOffset.toInt)
    out.toByteArray
  }

  private val ExifHeader = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  /** The full APP1 segment (marker + length + Exif header + TIFF). */
  def app1Bytes(littleEndian: Boolean, entries: Seq[Entry],
                subEntries: Seq[Entry] = Nil): Array[Byte] = {
    val tiff = tiffBytes(littleEndian, entries, subEntries)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xE1)
    val len = 2 + ExifHeader.length + tiff.length
    require(len <= 0xFFFF,
      s"APP1 payload $len bytes exceeds the 16-bit segment length field")
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(ExifHeader); out.write(tiff)
    out.toByteArray
  }

  /** Insert an APP1 segment right after SOI (where camera encoders put
    * it). */
  def withApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8)
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** One parsed IFD entry: which IFD it came from ("ifd0" / "exif"),
    * the tag, its TIFF type code, value count, and the canonical string
    * rendering (ASCII verbatim sans NUL; integers comma-joined decimal;
    * rationals `num/den`). */
  final case class ExifTag(ifd: String, tag: Int, ttype: Int,
                           n_values: Long, value: String)

  /** Locate the Exif APP1 segment via the marker walk (same framing
    * rules as [[Jpeg.decode]]: skip fill bytes, length-framed segments,
    * stop at SOS — metadata precedes entropy data). */
  def app1Tiff(p: Array[Byte]): Option[Array[Byte]] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      var j = i + 1
      while (j < p.length && (p(j) & 0xFF) == 0xFF) j += 1
      if (j >= p.length) return None
      val m = p(j) & 0xFF
      if (m == 0xD9 || m == 0xDA) return None // EOI / SOS: no APP1 seen
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i = j + 1 }
      else {
        if (j + 2 >= p.length) return None
        val len = ((p(j + 1) & 0xFF) << 8) | (p(j + 2) & 0xFF)
        val seg = j + 3; val segEnd = j + 1 + len
        if (segEnd > p.length) return None
        if (m == 0xE1 && segEnd - seg >= ExifHeader.length &&
            ExifHeader.indices.forall(k => p(seg + k) == ExifHeader(k)))
          return Some(java.util.Arrays.copyOfRange(p, seg + ExifHeader.length, segEnd))
        i = segEnd
      }
    }
    None
  }

  /** Parse a TIFF block: IFD0, then (when IFD0 carries the 0x8769
    * pointer) the Exif SUB-IFD — one level, the TIFF/EP shape real
    * cameras write (GPS/Interop pointers would walk the same way). The
    * pointer entry itself is structural and is NOT emitted as a tag.
    * Returns (byte order "II"/"MM", tags) or None on structural
    * corruption. */
  def parseTiff(t: Array[Byte]): Option[(String, Seq[ExifTag])] = {
    if (t.length < 8) return None
    val le =
      if (t(0) == 'I' && t(1) == 'I') true
      else if (t(0) == 'M' && t(1) == 'M') false
      else return None
    def u16(at: Int): Int =
      if (le) (t(at) & 0xFF) | ((t(at + 1) & 0xFF) << 8)
      else ((t(at) & 0xFF) << 8) | (t(at + 1) & 0xFF)
    def u32(at: Int): Long =
      if (le) (0 to 3).map(i => (t(at + i) & 0xFFL) << (8 * i)).sum
      else (0 to 3).map(i => (t(at + i) & 0xFFL) << (8 * (3 - i))).sum
    if (u16(2) != 42) return None
    val tags = Seq.newBuilder[ExifTag]
    // walk one IFD; returns Some(subIfdPointer or 0) or None on corruption
    def walkIfd(ifdAt: Long, label: String): Option[Long] = {
      if (ifdAt < 8 || ifdAt + 2 > t.length) return None
      val n = u16(ifdAt.toInt)
      val base = ifdAt.toInt + 2
      if (base + 12 * n + 4 > t.length) return None
      var subPtr = 0L
      var k = 0
      while (k < n) {
        val e = base + 12 * k
        val tag = u16(e); val typ = u16(e + 2); val count = u32(e + 4)
        if (tag == ExifIfdPointer && typ == 4 && count == 1 && label == "ifd0") {
          subPtr = u32(e + 8) // structural pointer, not a graded tag
        } else {
          val size = typ match {
            case 2 => count; case 3 => 2 * count; case 4 => 4 * count; case 5 => 8 * count
            case _ => -1L // unknown type: skip the entry, keep the walk
          }
          if (size >= 0) {
            if (count > 0xFFFF) return None // insane count: structural corruption
            val at = if (size <= 4) e + 8 else {
              val off = u32(e + 8)
              if (off + size > t.length) return None // offset overruns the block
              off.toInt
            }
            val value = typ match {
              case 2 => new String(t, at, count.toInt, US_ASCII).stripSuffix("\u0000")
              case 3 => (0 until count.toInt).map(i => u16(at + 2 * i)).mkString(",")
              case 4 => (0 until count.toInt).map(i => u32(at + 4 * i)).mkString(",")
              case 5 => (0 until count.toInt)
                .map(i => s"${u32(at + 8 * i)}/${u32(at + 8 * i + 4)}").mkString(",")
            }
            tags += ExifTag(label, tag, typ, count, value)
          }
        }
        k += 1
      }
      Some(subPtr)
    }
    walkIfd(u32(4), "ifd0") match {
      case None => None
      case Some(0L) => Some((if (le) "II" else "MM", tags.result()))
      case Some(sub) =>
        if (walkIfd(sub, "exif").isEmpty) None
        else Some((if (le) "II" else "MM", tags.result()))
    }
  }

  /** EXIF of a JPEG payload, or None (no APP1 / corrupt IFD). */
  def parseExif(p: Array[Byte]): Option[(String, Seq[ExifTag])] =
    try app1Tiff(p).flatMap(parseTiff)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  // ------------------------------------------------------ graded fixture

  import java.lang.Math.floorMod

  /** Intel (II) for even ids, Motorola (MM) for odd — both byte-order
    * lineages graded (mirrored by the oracle's doc_id % 2 CASE). */
  def fxLittleEndian(id: Long): Boolean = floorMod(id, 2) == 0

  /** Closed-form IFD0 per id, exercising every graded shape: inline
    * LONG (ImageWidth — the real fixture width), spilled ASCII (Make /
    * Model / DateTime), inline SHORT (Orientation), spilled RATIONAL
    * (XResolution). Ascending-tag order per the TIFF spec. */
  def fxEntries(id: Long): Seq[Entry] = Seq(
    Entry(0x0100, Longs(Seq(Multimodal.fxW(id).toLong))),
    Entry(0x010F, Ascii("graft")),
    Entry(0x0110, Ascii(s"cam-${floorMod(id, 100)}")),
    Entry(0x0112, Shorts(Seq(floorMod(id, 8).toInt + 1))),
    Entry(0x011A, Rational(floorMod(id, 300) + 1, 25)),
    Entry(0x0132, Ascii(f"2026:01:01 00:00:${floorMod(id, 60)}%02d")))

  /** Closed-form Exif SUB-IFD per id: the capture metadata cameras put
    * behind the 0x8769 pointer — ExposureTime and FNumber (RATIONAL),
    * ISO (SHORT), and a spilled-ASCII LensModel. */
  def fxSubEntries(id: Long): Seq[Entry] = Seq(
    Entry(0x829A, Rational(1, floorMod(id, 250) + 1)),
    Entry(0x829D, Rational(floorMod(id, 60) + 10, 10)),
    Entry(0x8827, Shorts(Seq(100 + floorMod(id, 8).toInt * 50))),
    Entry(0xA434, Ascii(s"lens-${floorMod(id, 30)}")))

  /** The REAL baseline-JPEG fixture with its EXIF planted after SOI —
    * the full camera-file shape (metadata + entropy-coded scan),
    * IFD0 plus the pointed-to Exif sub-IFD. */
  def syntheticJpegWithExif(id: Long): Array[Byte] =
    withApp1(Multimodal.syntheticJpegScan(id),
      app1Bytes(fxLittleEndian(id), fxEntries(id), fxSubEntries(id)))

  /** Graded query: EXIF round trip through real JPEG bytes — one row
    * per entry of BOTH IFDs (ifd0 and the pointed-to exif sub-IFD),
    * byte order carried per asset. Partition-wise flatMap like every
    * media decode. */
  def jpegExifQuery(spark: org.apache.spark.sql.SparkSession,
                    docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        parseExif(syntheticJpegWithExif(id)).iterator.flatMap { case (bo, tags) =>
          tags.map(t => (id, bo, t.ifd, t.tag.toLong, t.ttype.toLong, t.n_values, t.value))
        }
      })
      .toDF("media_id", "byte_order", "ifd", "tag", "ttype", "n_values", "value")
      .orderBy("media_id", "tag")
  }
}
