package graft

import org.apache.spark.sql.functions._
import graft.ext.{Exif, Gif, Jpeg, Mp4, Multimodal, MediaRecord}
import graft.sources.{Avro, Charset, Tar, Warc}

/** Codec fuzz properties — random truncations and bit flips of the REAL
  * fixture bytes, per byte-level family. Two contracts, per each
  * family's Scaladoc:
  *
  *  - DEGRADE families (image/audio/video/EXIF decoders): a corrupt
  *    payload must become a graded degraded row — `None` / sentinel
  *    features — and NEVER let any exception escape (at 100 TB one bad
  *    crawl payload must not kill a stage);
  *  - LOUD families (engine-written container sources: WARC, WARC.gz,
  *    tar, Avro OCF): corruption must fail with the contract's
  *    DESCRIPTIVE exception (require → IllegalArgumentException, or the
  *    codec's own DataFormatException for a corrupt deflate body) —
  *    never an index error, NPE, OOM, or a hang.
  *
  * The per-family corrupt-fixture specs pin specific cuts; these
  * properties generalize them over seeded-random mutation streams. */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xC0FFEE)
  private val Reps = 60
  private val Ids = 0L until 15L

  /** Seeded mutation stream: truncate at a random point, flip a random
    * bit, or both. */
  private def mutations(payload: Array[Byte]): Iterator[Array[Byte]] =
    Iterator.tabulate(Reps) { _ =>
      def flipped(b: Array[Byte]): Array[Byte] = {
        if (b.nonEmpty) {
          val i = rnd.nextInt(b.length)
          b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        b
      }
      rnd.nextInt(3) match {
        case 0 => java.util.Arrays.copyOf(payload, rnd.nextInt(payload.length + 1))
        case 1 => flipped(payload.clone())
        case _ => flipped(
          java.util.Arrays.copyOf(payload, rnd.nextInt(payload.length + 1)))
      }
    }

  private def degradeNeverThrows[T](name: String, payloads: Seq[Array[Byte]])
                                   (decode: Array[Byte] => T): Unit =
    for (p <- payloads; m <- mutations(p)) {
      try decode(m) catch {
        case e: Throwable =>
          fail(s"$name: ${e.getClass.getName} escaped a degrade-contract " +
            s"decoder (len=${m.length}): ${e.getMessage}")
      }
    }

  private def loudOnly[T](name: String, payloads: Seq[Array[Byte]],
                          allowed: Class[_]*)(decode: Array[Byte] => T): Unit =
    for (p <- payloads; m <- mutations(p)) {
      try decode(m) catch {
        case e: Throwable if allowed.exists(_.isInstance(e)) => ()
        case e: Throwable =>
          fail(s"$name: non-contract ${e.getClass.getName} escaped " +
            s"(len=${m.length}): ${e.getMessage}")
      }
    }

  // ------------------------------------------------------------ degrade

  test("fuzz: JPEG full decode (baseline + progressive) never throws") {
    degradeNeverThrows("jpeg",
      Ids.map(Multimodal.syntheticJpegScan) ++
        Ids.map(Multimodal.syntheticJpegProgressive))(Jpeg.decode)
  }

  test("fuzz: PNG decode never throws") {
    degradeNeverThrows("png",
      Ids.map(Multimodal.syntheticPng) ++
        Ids.map(Multimodal.syntheticPngWithText))(
      b => Multimodal.decodePng(MediaRecord(1L, "image", b, "s")))
  }

  test("fuzz: GIF decode never throws") {
    degradeNeverThrows("gif", Ids.map(Gif.syntheticGif))(Gif.decode)
  }

  test("fuzz: MP4 box walk never throws") {
    degradeNeverThrows("mp4", Ids.map(Mp4.syntheticMp4))(Mp4.parse)
  }

  test("fuzz: MJPEG-in-MP4 frame extraction never throws") {
    degradeNeverThrows("mjpeg-mp4", Ids.map(Mp4.syntheticMjpegMp4))(
      p => Mp4.mjpegFrames(0L, p))
  }

  test("fuzz: tone-WAV DFT analysis never throws") {
    degradeNeverThrows("tone-wav", Ids.map(Multimodal.syntheticToneWav))(
      p => Multimodal.toneBins(0L, p))
    degradeNeverThrows("spectro-wav", Ids.map(Multimodal.syntheticSpectroWav))(
      p => Multimodal.spectroBins(0L, p))
  }

  test("fuzz: WAV decode never throws") {
    degradeNeverThrows("wav",
      Ids.map(Multimodal.syntheticWav) ++
        Ids.map(Multimodal.syntheticWavWithInfo) ++
        Ids.map(Multimodal.syntheticToneWav))(
      b => Multimodal.decodeWav(MediaRecord(1L, "audio", b, "s")))
  }

  test("fuzz: BMP/PPM/JPEG-shell feature decode never throws") {
    degradeNeverThrows("image", Ids.map(Multimodal.syntheticPayload))(
      b => Multimodal.decode(MediaRecord(1L, "image", b, "s")))
  }

  test("fuzz: EXIF APP1 walk never throws") {
    degradeNeverThrows("exif", Ids.map(Exif.syntheticJpegWithExif))(Exif.parseExif)
  }

  test("fuzz: charset sniff throws only the strict-decode contract") {
    val salted = "doc body " + Charset.Salt
    loudOnly("charset",
      Charset.Encodings.map(e => Charset.encodeBytes(s"7\t$salted\n", e)),
      classOf[java.nio.charset.CharacterCodingException])(Charset.sniffDecode)
  }

  // --------------------------------------------------------------- loud

  private lazy val fixtureDocs =
    Tables.documents(spark, "/root/testdata/sf0.001").filter(col("doc_id") < 40)

  private def fileBytes(dir: String, ext: String): Seq[Array[Byte]] = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(ext)).iterator()
    val out = Seq.newBuilder[Array[Byte]]
    while (s.hasNext) out += java.nio.file.Files.readAllBytes(s.next())
    out.result()
  }

  test("fuzz: WARC record walk fails only via its descriptive requires") {
    val dir = Warc.writeCorpus(spark, fixtureDocs, "/root/testdata/sf0.001")
    loudOnly("warc", fileBytes(dir, ".warc"),
      classOf[IllegalArgumentException])(
      b => Warc.parseRecords(b).foreach(_ => ()))
  }

  test("fuzz: gzip WARC member walk fails only via requires or DataFormatException") {
    val dir = Warc.writeCorpusGz(spark, fixtureDocs, "/root/testdata/sf0.001")
    loudOnly("warc.gz", fileBytes(dir, ".warc.gz"),
      classOf[IllegalArgumentException],
      classOf[java.util.zip.DataFormatException])(
      b => Warc.parseGzipMembers(b).foreach(m => Warc.parseRecords(m).foreach(_ => ())))
  }

  test("fuzz: tar entry walk fails only via its descriptive requires") {
    val dir = Tar.writeCorpus(spark, fixtureDocs, "/root/testdata/sf0.001")
    loudOnly("tar", fileBytes(dir, ".tar"),
      classOf[IllegalArgumentException])(
      b => Tar.parseEntries(b).foreach(_ => ()))
  }

  test("fuzz: avro container validation fails only via its descriptive requires") {
    val dir = Avro.writeCorpus(spark, fixtureDocs, "/root/testdata/sf0.001")
    loudOnly("avro", fileBytes(dir, ".avro"),
      classOf[IllegalArgumentException])(Avro.validateContainer)
  }
}
