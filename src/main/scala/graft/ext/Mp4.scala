package graft.ext

import java.lang.Math.floorMod

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MP4 / ISO-BMFF (ISO 14496-12) container walker — the video member of
  * the multimodal codec family. Codec payloads stay opaque (that is the
  * point of a container), but everything a training pipeline needs
  * BEFORE a decoder — dimensions, duration, the sample table that maps
  * frame index → byte range — is real byte-level parsing: length+fourcc
  * box nesting (moov→trak→mdia→minf→stbl), mvhd/tkhd/mdhd headers with
  * 16.16 fixed-point dimensions, and the stts/stsz/stco sample tables
  * from which the walker extracts every sample's actual bytes out of
  * mdat. The graded positional checksum over those bytes proves the
  * offset arithmetic — a walker that misreads one box length or
  * off-by-ones a sample boundary mismatches.
  *
  * Scale shape: identical to the other codecs — `mapPartitions` over
  * payload byte arrays, fixed-width features out, corrupt bytes degrade
  * to sentinel rows. At crawl scale the moov box is parsed from the
  * first/last few MB of the object (byte-range reads), never the full
  * blob; the walker is a pure bytes→meta function either way.
  */
object Mp4 {

  // ------------------------------------------------------------------
  // encoder (fixture writer)
  // ------------------------------------------------------------------

  private def u16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xFF); o.write(v & 0xFF)
  }
  private def u32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >>> 24) & 0xFF).toInt); o.write(((v >>> 16) & 0xFF).toInt)
    o.write(((v >>> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
  }
  private def box(fourcc: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val payload = new java.io.ByteArrayOutputStream()
    body(payload)
    val o = new java.io.ByteArrayOutputStream()
    u32(o, 8L + payload.size())
    o.write(fourcc.getBytes("US-ASCII"))
    payload.writeTo(o)
    o.toByteArray
  }
  private def fullBox(fourcc: String, version: Int = 0, flags: Int = 0)
                     (body: java.io.ByteArrayOutputStream => Unit): Array[Byte] =
    box(fourcc) { o =>
      o.write(version); o.write((flags >>> 16) & 0xFF)
      o.write((flags >>> 8) & 0xFF); o.write(flags & 0xFF)
      body(o)
    }

  private val IdentityMatrix: Seq[Long] =
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)

  /** A structurally valid single-video-track MP4: ftyp + moov
    * (mvhd/trak(tkhd/mdia(mdhd/hdlr/minf(stbl(stsd/stts/stsc/stsz/
    * stco))))) + mdat. `sample(i)` gives each sample's bytes; stco is
    * patched to the true mdat payload offset after moov is sized. */
  def encode(widthPx: Int, heightPx: Int, timescale: Long, durationTs: Long,
             samples: IndexedSeq[Array[Byte]],
             chunkSizes: Seq[Int] = Nil): Array[Byte] = {
    val n = samples.length
    require(n > 0 && durationTs >= n, "fixture: at least one sample, integral deltas")
    // chunk layout: samples partition into stco chunks (default: one).
    // Multi-chunk files carry a 3-byte garbage gap BETWEEN chunks inside
    // mdat — legal (mdat bytes outside the sample table are meaningless)
    // and load-bearing: a reader that assumes samples sit consecutively
    // from the first chunk offset reads the gap and fails the checksum.
    val chunks = if (chunkSizes.isEmpty) Seq(n) else chunkSizes
    require(chunks.sum == n && chunks.forall(_ > 0), "fixture: bad chunking")
    val Gap = Array[Byte](0xEE.toByte, 0xBB.toByte, 0xEE.toByte)
    val chunkSamples: Seq[IndexedSeq[Array[Byte]]] = {
      val it = samples.iterator
      chunks.map(k => IndexedSeq.fill(k)(it.next()))
    }
    // stsc run-length compression: a new entry only when spc changes
    val stscEntries = chunks.zipWithIndex
      .foldLeft(Vector.empty[(Int, Int)]) { case (acc, (spc, c)) =>
        if (acc.nonEmpty && acc.last._2 == spc) acc else acc :+ ((c + 1, spc))
      }
    val delta = durationTs / n
    val ftyp = box("ftyp") { o =>
      o.write("isom".getBytes("US-ASCII")); u32(o, 512L)
      o.write("isom".getBytes("US-ASCII")); o.write("mp41".getBytes("US-ASCII"))
    }
    def moovWith(mdatPayloadOffset: Long): Array[Byte] = box("moov") { mo =>
      mo.write(fullBox("mvhd") { o =>
        u32(o, 0); u32(o, 0) // creation, modification
        u32(o, timescale); u32(o, durationTs)
        u32(o, 0x00010000L); u16(o, 0x0100); u16(o, 0) // rate, volume, reserved
        u32(o, 0); u32(o, 0) // reserved[2]
        IdentityMatrix.foreach(u32(o, _))
        (0 until 6).foreach(_ => u32(o, 0)) // pre_defined
        u32(o, 2) // next_track_ID
      })
      mo.write(box("trak") { to =>
        to.write(fullBox("tkhd", flags = 7) { o =>
          u32(o, 0); u32(o, 0); u32(o, 1); u32(o, 0) // times, track id, reserved
          u32(o, durationTs)
          u32(o, 0); u32(o, 0) // reserved[2]
          u16(o, 0); u16(o, 0); u16(o, 0); u16(o, 0) // layer, group, volume, reserved
          IdentityMatrix.foreach(u32(o, _))
          u32(o, widthPx.toLong << 16); u32(o, heightPx.toLong << 16) // 16.16
        })
        to.write(box("mdia") { md =>
          md.write(fullBox("mdhd") { o =>
            u32(o, 0); u32(o, 0); u32(o, timescale); u32(o, durationTs)
            u16(o, 0x55C4); u16(o, 0) // language "und", pre_defined
          })
          md.write(fullBox("hdlr") { o =>
            u32(o, 0); o.write("vide".getBytes("US-ASCII"))
            u32(o, 0); u32(o, 0); u32(o, 0)
            o.write("graft".getBytes("US-ASCII")); o.write(0)
          })
          md.write(box("minf") { mi =>
            mi.write(box("stbl") { st =>
              st.write(fullBox("stsd") { o =>
                u32(o, 1)
                // one generic visual sample entry (opaque codec payload)
                val entry = box("mp4v") { e =>
                  (0 until 6).foreach(_ => e.write(0)); u16(e, 1) // reserved, data_ref
                  u16(e, 0); u16(e, 0); u32(e, 0); u32(e, 0); u32(e, 0)
                  u16(e, widthPx); u16(e, heightPx)
                  u32(e, 0x00480000L); u32(e, 0x00480000L) // 72 dpi
                  u32(e, 0); u16(e, 1)
                  (0 until 32).foreach(_ => e.write(0)) // compressorname
                  u16(e, 0x18); u16(e, 0xFFFF)
                }
                o.write(entry)
              })
              st.write(fullBox("stts") { o =>
                u32(o, 1); u32(o, n.toLong); u32(o, delta)
              })
              st.write(fullBox("stsc") { o =>
                u32(o, stscEntries.length.toLong)
                stscEntries.foreach { case (first, spc) =>
                  u32(o, first.toLong); u32(o, spc.toLong); u32(o, 1)
                }
              })
              st.write(fullBox("stsz") { o =>
                u32(o, 0); u32(o, n.toLong)
                samples.foreach(s => u32(o, s.length.toLong))
              })
              st.write(fullBox("stco") { o =>
                u32(o, chunks.length.toLong)
                var off = mdatPayloadOffset
                chunkSamples.zipWithIndex.foreach { case (cs, c) =>
                  if (c > 0) off += Gap.length // the inter-chunk garbage
                  u32(o, off)
                  off += cs.map(_.length.toLong).sum
                }
              })
            })
          })
        })
      })
    }
    // two-pass: moov size does not depend on the offset value (u32 fixed)
    val moovSize = moovWith(0L).length
    val mdatPayloadOffset = ftyp.length.toLong + moovSize + 8
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp)
    out.write(moovWith(mdatPayloadOffset))
    out.write(box("mdat") { o =>
      chunkSamples.zipWithIndex.foreach { case (cs, c) =>
        if (c > 0) o.write(Gap)
        cs.foreach(o.write)
      }
    })
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // walker
  // ------------------------------------------------------------------

  final case class Mp4Meta(timescale: Long, durationTs: Long, width: Int, height: Int,
                           sampleOffsets: Array[Long], sampleSizes: Array[Long],
                           mdatStart: Long, mdatSize: Long)

  /** Walk the box tree of one MP4 byte array. None on any malformed
    * structure (bad length, missing required box, sample table running
    * past mdat). */
  def parse(p: Array[Byte]): Option[Mp4Meta] = try {
    def rdU32(o: Int): Long =
      ((p(o) & 0xFFL) << 24) | ((p(o + 1) & 0xFFL) << 16) |
        ((p(o + 2) & 0xFFL) << 8) | (p(o + 3) & 0xFFL)
    def fourcc(o: Int): String = new String(p, o, 4, "US-ASCII")
    // collect direct children of [start, end)
    def children(start: Int, end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var i = start
      while (i < end) {
        if (i + 8 > end) return Seq.empty
        val size = rdU32(i)
        if (size < 8 || i + size > end) return Seq.empty
        out += ((fourcc(i + 4), i + 8, i + size.toInt))
        i += size.toInt
      }
      out.result()
    }
    def child(cs: Seq[(String, Int, Int)], name: String): Option[(Int, Int)] =
      cs.collectFirst { case (n, s, e) if n == name => (s, e) }
    val top = children(0, p.length)
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val (moovS, moovE) = child(top, "moov").getOrElse(return None)
    val (mdatS, mdatE) = child(top, "mdat").getOrElse(return None)
    val moov = children(moovS, moovE)
    val (mvhdS, _) = child(moov, "mvhd").getOrElse(return None)
    if ((p(mvhdS) & 0xFF) != 0) return None // version-0 fixtures only
    val timescale = rdU32(mvhdS + 12)
    val durationTs = rdU32(mvhdS + 16)
    val (trakS, trakE) = child(moov, "trak").getOrElse(return None)
    val trak = children(trakS, trakE)
    val (tkhdS, _) = child(trak, "tkhd").getOrElse(return None)
    val width = (rdU32(tkhdS + 76) >> 16).toInt  // 16.16 after matrix
    val height = (rdU32(tkhdS + 80) >> 16).toInt
    val (mdiaS, mdiaE) = child(trak, "mdia").getOrElse(return None)
    val mdia = children(mdiaS, mdiaE)
    val (minfS, minfE) = child(mdia, "minf").getOrElse(return None)
    val (stblS, stblE) = child(children(minfS, minfE), "stbl").getOrElse(return None)
    val stbl = children(stblS, stblE)
    val (stszS, _) = child(stbl, "stsz").getOrElse(return None)
    val uniform = rdU32(stszS + 4)
    val nSamples = rdU32(stszS + 8).toInt
    if (nSamples <= 0 || nSamples > (p.length >> 2)) return None
    val sizes = Array.tabulate(nSamples) { i =>
      if (uniform != 0) uniform else rdU32(stszS + 12 + 4 * i)
    }
    val (stcoS, _) = child(stbl, "stco").getOrElse(return None)
    val nChunks = rdU32(stcoS + 4).toInt
    if (nChunks <= 0 || nChunks > (p.length >> 2)) return None
    val chunkOff = Array.tabulate(nChunks)(k => rdU32(stcoS + 8 + 4 * k))
    // stsc: run-length (first_chunk, samples_per_chunk) entries — the
    // samples-per-chunk of chunk c is the entry with the greatest
    // first_chunk <= c (ISO 14496-12 §8.7.4)
    val (stscS, _) = child(stbl, "stsc").getOrElse(return None)
    val nStsc = rdU32(stscS + 4).toInt
    if (nStsc <= 0 || nStsc > nChunks) return None
    val stscFirst = Array.tabulate(nStsc)(e => rdU32(stscS + 8 + 12 * e).toInt)
    val stscSpc = Array.tabulate(nStsc)(e => rdU32(stscS + 12 + 12 * e).toInt)
    if (stscFirst(0) != 1) return None
    val offsets = new Array[Long](nSamples)
    var i = 0
    var e = 0
    var c = 1
    while (c <= nChunks && i < nSamples) {
      while (e + 1 < nStsc && stscFirst(e + 1) <= c) e += 1
      var acc = chunkOff(c - 1)
      if (acc < mdatS) return None
      var k = 0
      while (k < stscSpc(e) && i < nSamples) {
        offsets(i) = acc; acc += sizes(i); i += 1; k += 1
      }
      if (acc > mdatE) return None // chunk must live inside mdat
      c += 1
    }
    if (i != nSamples) return None // stsc/stco cover fewer samples than stsz
    Some(Mp4Meta(timescale, durationTs, width, height, offsets, sizes,
      mdatS.toLong, (mdatE - mdatS).toLong))
  } catch {
    case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
  }

  // ------------------------------------------------------------------
  // fixtures + graded query
  // ------------------------------------------------------------------

  def fxWidth(id: Long): Int = (floorMod(id, 5).toInt + 1) * 64
  def fxHeight(id: Long): Int = (floorMod(id, 4).toInt + 1) * 48
  def fxSamples(id: Long): Int = floorMod(id, 7).toInt + 2
  def fxSampleLen(id: Long): Int = floorMod(id, 11).toInt + 5
  def fxDurationMs(id: Long): Long = fxSamples(id).toLong * (floorMod(id, 6) + 1L) * 40L
  def fxByte(id: Long, i: Int, j: Int): Int = floorMod(id * 31 + i * 7 + j, 256).toInt

  /** Multi-chunk layout for every 3rd fixture: a 1-sample head chunk,
    * then chunks of 2 (the tail chunk may be short) — exercises stsc
    * run selection AND the inter-chunk garbage gap the encoder plants.
    * Other ids keep the single-chunk layout, so both paths stay graded
    * under the SAME closed-form oracle (the checksum is layout-free). */
  def fxChunks(id: Long): Seq[Int] = {
    val n = fxSamples(id)
    if (floorMod(id, 3) != 0) Seq(n)
    else Seq(1) ++ Seq.fill((n - 1) / 2)(2) ++
      (if ((n - 1) % 2 == 1) Seq(1) else Nil)
  }

  def syntheticMp4(id: Long): Array[Byte] =
    encode(fxWidth(id), fxHeight(id), 1000L, fxDurationMs(id),
      IndexedSeq.tabulate(fxSamples(id))(i =>
        Array.tabulate(fxSampleLen(id))(j => fxByte(id, i, j).toByte)),
      fxChunks(id))

  final case class Mp4Features(media_id: Long, duration_ms: Long, width: Long,
                               height: Long, n_samples: Long, sample_bytes: Long,
                               checksum: Long)

  /** Decode one record: metadata plus the positional checksum
    * `Σ_{i,j} (b+1)·(i·len+j+1)` over the sample bytes EXTRACTED VIA THE
    * SAMPLE TABLE (stsz sizes + stco/cumsum offsets into mdat) — the
    * proof the offset arithmetic is right, which duration/dims alone
    * can't give. */
  def features(id: Long, p: Array[Byte]): Mp4Features = parse(p) match {
    case None => Mp4Features(id, -1L, -1L, -1L, -1L, -1L, -1L)
    case Some(m) =>
      var ck = 0L; var total = 0L; var pos = 1L
      var i = 0
      while (i < m.sampleOffsets.length) {
        var j = 0
        while (j < m.sampleSizes(i)) {
          ck += ((p((m.sampleOffsets(i) + j).toInt) & 0xFF) + 1L) * pos
          pos += 1; j += 1
        }
        total += m.sampleSizes(i)
        i += 1
      }
      Mp4Features(id, m.durationTs * 1000L / m.timescale, m.width.toLong,
        m.height.toLong, m.sampleOffsets.length.toLong, total, ck)
  }

  /** End-to-end MP4 metadata + sample-walk query, partition-wise like
    * every codec. */
  def mp4Query(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => features(id, syntheticMp4(id))))
      .toDF().orderBy("media_id")
  }

  // ------------------------------------------------------------------
  // MJPEG-in-MP4 frame extraction (VLM frame sampling)
  // ------------------------------------------------------------------

  /** Per-frame colors of the MJPEG fixtures — closed-form in (id, frame)
    * so the DuckDB oracle replays them. */
  def fxFrameR(id: Long, i: Int): Int = floorMod(id * 13 + i * 17, 251).toInt
  def fxFrameG(id: Long, i: Int): Int = floorMod(id * 7 + i * 29, 251).toInt
  def fxFrameB(id: Long, i: Int): Int = floorMod(id * 3 + i * 5, 251).toInt
  def fxFrameCount(id: Long): Int = floorMod(id, 5).toInt + 2
  def fxMjpegGray(id: Long): Boolean = floorMod(id, 7) == 3
  def fxMjpeg420(id: Long): Boolean = floorMod(id, 2) == 1

  /** A REAL MJPEG-in-MP4: every sample in the table is an entropy-coded
    * baseline JPEG (constant color per FRAME, rotating gray/420/444 like
    * the still-image fixtures — constant blocks decode exactly, so the
    * per-frame means stay SQL-replayable). Every 3rd id keeps the
    * multi-chunk stsc layout with the inter-chunk garbage gap. */
  def syntheticMjpegMp4(id: Long): Array[Byte] = {
    val n = fxFrameCount(id)
    val w = Multimodal.fxW(id); val h = Multimodal.fxH(id)
    val samples = IndexedSeq.tabulate(n) { i =>
      if (fxMjpegGray(id)) Jpeg.encodeGray(w, h, (_, _) => fxFrameR(id, i), 0)
      else {
        val px = (fxFrameR(id, i) << 16) | (fxFrameG(id, i) << 8) | fxFrameB(id, i)
        Jpeg.encode(w, h, (_, _) => px, fxMjpeg420(id), 0)
      }
    }
    val chunks =
      if (floorMod(id, 3) != 0) Seq(n)
      else Seq(1) ++ Seq.fill((n - 1) / 2)(2) ++
        (if ((n - 1) % 2 == 1) Seq(1) else Nil)
    encode(w, h, 1000L, n.toLong * 40L, samples, chunks)
  }

  final case class MjpegFrame(media_id: Long, frame_no: Long, width: Long,
                              height: Long, mean_r: Long, mean_g: Long,
                              mean_b: Long)

  /** Decode one MJPEG-in-MP4: the stsc/stco/stsz walk hands each
    * sample's byte range out of mdat, and each range decodes as a full
    * baseline JPEG (Huffman → dequant → IDCT → upsample → RGB). A
    * corrupt SAMPLE degrades to a sentinel frame row while its siblings
    * still decode; a corrupt CONTAINER degrades to one sentinel row —
    * grade, never throw. */
  def mjpegFrames(id: Long, p: Array[Byte]): Seq[MjpegFrame] = parse(p) match {
    case None => Seq(MjpegFrame(id, -1L, -1L, -1L, -1L, -1L, -1L))
    case Some(m) =>
      m.sampleOffsets.indices.map { i =>
        val off = m.sampleOffsets(i).toInt
        val len = m.sampleSizes(i).toInt
        val frame =
          if (off < 0 || len <= 0 || off + len > p.length) None
          else Jpeg.decode(java.util.Arrays.copyOfRange(p, off, off + len))
        frame match {
          case Some(d) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            d.rgb.foreach { px =>
              sr += (px >> 16) & 0xFF; sg += (px >> 8) & 0xFF; sb += px & 0xFF
            }
            val n = d.rgb.length.toLong
            MjpegFrame(id, i.toLong, d.width.toLong, d.height.toLong,
              sr / n, sg / n, sb / n)
          case None => MjpegFrame(id, i.toLong, -1L, -1L, -1L, -1L, -1L)
        }
      }
  }

  /** Graded query: video frame extraction — the VLM-training
    * frame-sampling shape. Partition-wise over payloads like every
    * codec; at crawl scale the decode fans out per (video, frame) with
    * byte-range reads, never a whole-file driver pass. */
  def mjpegFramesQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap(id => mjpegFrames(id, syntheticMjpegMp4(id))))
      .toDF().orderBy("media_id", "frame_no")
  }
}
