package graft.ext

import java.lang.Math.floorMod

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** GIF (87a/89a) codec — the palette-indexed member of the multimodal
  * codec family, hand-rolled at byte level like the PNG/JPEG/WAV paths:
  * logical-screen + color-table parse, extension-block skipping, and a
  * REAL variable-width LZW stream (9→12-bit code growth, clear-code
  * dictionary resets at 4096, the KwKwK self-reference case) with
  * 4-pass interlace support. The encoder exists to plant closed-form
  * fixtures the decoder must walk back out — compression is genuine, so
  * the decoder's dictionary replay is exercised, not mocked.
  *
  * Scale shape: identical to the other codecs — decode runs
  * `mapPartitions` over byte arrays (a binary format walker has no
  * Catalyst-expression equivalent), one decoder context per partition,
  * corrupt payloads degrade to sentinel rows instead of exceptions.
  */
object Gif {

  // ------------------------------------------------------------------
  // LZW, GIF flavor: LSB-first bit packing, variable code width
  // ------------------------------------------------------------------

  private val MaxCode = 4096 // codes are 12-bit at most

  /** Encode palette indices as a raw GIF-LZW code stream (before
    * sub-block packaging). The encoder's `next` counter runs one ahead
    * of the decoder's (the decoder adds no entry for the first code
    * after a clear), so its width bump fires at `(1<<width)+1` where
    * the decoder's fires at `1<<width` — except at the final flush,
    * where the counters align and the decoder-mirroring check applies
    * before the end code (a classic off-by-one that corrupts the last
    * code of images whose flush lands exactly on a width boundary). */
  def lzwEncode(minCodeSize: Int, indices: Array[Int]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new scala.collection.mutable.ArrayBuffer[Byte](indices.length / 2 + 16)
    var bitBuf = 0L
    var nBits = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) {
        out += (bitBuf & 0xFF).toByte; bitBuf >>>= 8; nBits -= 8
      }
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var next = end + 1
    emit(clear)
    var cur = indices(0)
    var i = 1
    while (i < indices.length) {
      val k = indices(i)
      val key = (cur.toLong << 16) | k
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next < MaxCode) {
          dict.put(key, next)
          next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
        } else {
          emit(clear)
          dict = new java.util.HashMap[Long, Integer]()
          next = end + 1
          width = minCodeSize + 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    // flush emits no dict entry, so encoder and decoder counters align
    // HERE: mirror the decoder's width bump before writing the end code
    if (next == (1 << width) && width < 12) width += 1
    emit(end)
    if (nBits > 0) out += (bitBuf & 0xFF).toByte
    out.toArray
  }

  /** Decode a raw GIF-LZW code stream back to palette indices; None on
    * any malformed stream (bad code, missing end, overrun). */
  def lzwDecode(minCodeSize: Int, data: Array[Byte], maxPixels: Int): Option[Array[Int]] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new scala.collection.mutable.ArrayBuffer[Int](maxPixels)
    // dictionary as (prefixCode, lastSymbol) so entries are O(1) to add;
    // strings materialize by walking prefixes
    val prefix = new Array[Int](MaxCode)
    val last = new Array[Int](MaxCode)
    val length = new Array[Int](MaxCode)
    var next = end + 1
    var width = minCodeSize + 1
    var prev = -1
    var bitPos = 0
    val nBitsTotal = data.length * 8
    def readCode(): Int = {
      if (bitPos + width > nBitsTotal) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val bit = (data((bitPos + i) >> 3) >> ((bitPos + i) & 7)) & 1
        v |= bit << i
        i += 1
      }
      bitPos += width
      v
    }
    def expand(code: Int): Array[Int] = {
      val s = new Array[Int](length(code))
      var c = code
      var i = s.length - 1
      while (i >= 0) { s(i) = last(c); c = prefix(c); i -= 1 }
      s
    }
    (0 until clear).foreach { i => prefix(i) = -1; last(i) = i; length(i) = 1 }
    var done = false
    while (!done) {
      val code = readCode()
      if (code < 0 || code > next || out.length > maxPixels) return None
      if (code == clear) {
        next = end + 1; width = minCodeSize + 1; prev = -1
      } else if (code == end) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return None
        out += code
        prev = code
      } else {
        val entry: Array[Int] =
          if (code < next && code != clear && code != end) expand(code)
          else if (code == next) { // KwKwK: prev's string + its first symbol
            val p = expand(prev); p :+ p(0)
          } else return None
        out ++= entry
        if (next < MaxCode) {
          prefix(next) = prev; last(next) = entry(0)
          length(next) = length(prev) + 1
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out.toArray)
  }

  // ------------------------------------------------------------------
  // GIF container
  // ------------------------------------------------------------------

  /** The 4-pass interlace row order for height `h` (pass offsets
    * 0/4/2/1, steps 8/8/4/2). */
  def interlaceRows(h: Int): Array[Int] =
    (Array(0 -> 8, 4 -> 8, 2 -> 4, 1 -> 2).flatMap { case (off, step) =>
      off until h by step
    })

  /** Encode a GIF89a: global 256-color table, a comment and a graphic
    * control extension (the decoder must skip both), one image,
    * optionally interlaced, genuinely LZW-compressed. `palette(i)` is
    * packed 0xRRGGBB; `idx(x, y)` the palette index per pixel. */
  def encode(w: Int, h: Int, interlaced: Boolean, palette: Array[Int],
             idx: (Int, Int) => Int): Array[Byte] = {
    require(palette.length == 256, "fixture uses a full 256-entry table")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7) // GCT present, color res 8, table size 2^8
    out.write(0); out.write(0)
    palette.foreach { p =>
      out.write((p >> 16) & 0xFF); out.write((p >> 8) & 0xFF); out.write(p & 0xFF)
    }
    // graphic control extension (89a) — skipped by the parser
    out.write(Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0))
    // comment extension — also skipped
    val comment = s"graft $w x $h".getBytes("US-ASCII")
    out.write(0x21); out.write(0xFE)
    out.write(comment.length); out.write(comment); out.write(0)
    // image descriptor + compressed raster
    writeImageBlock(out, w, h, interlaced, idx)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  private def writeImageBlock(out: java.io.ByteArrayOutputStream, w: Int, h: Int,
                              interlaced: Boolean, idx: (Int, Int) => Int,
                              left: Int = 0, top: Int = 0): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write(0x2C)
    u16(left); u16(top); u16(w); u16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    // pixel indices in transmission order
    val rows = if (interlaced) interlaceRows(h) else (0 until h).toArray
    val indices = new Array[Int](w * h)
    var p = 0
    for (y <- rows; x <- 0 until w) { indices(p) = idx(x, y) & 0xFF; p += 1 }
    out.write(8) // LZW min code size
    val stream = lzwEncode(8, indices)
    var o = 0
    while (o < stream.length) {
      val n = math.min(255, stream.length - o)
      out.write(n); out.write(stream, o, n)
      o += n
    }
    out.write(0) // sub-block terminator
  }

  /** Encode an ANIMATED GIF89a: NETSCAPE 2.0 loop-count application
    * extension, then per frame a Graphic Control Extension carrying its
    * centisecond delay followed by its (optionally interlaced) image
    * block. Frames are full-canvas (compositing/disposal is the
    * documented out-of-scope boundary — see [[decodeAnimation]]). */
  def encodeAnimated(w: Int, h: Int, palette: Array[Int], loops: Int,
                     frames: Seq[(Int, Boolean, (Int, Int) => Int)]): Array[Byte] = {
    require(palette.length == 256 && frames.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xF7); out.write(0); out.write(0)
    palette.foreach { p =>
      out.write((p >> 16) & 0xFF); out.write((p >> 8) & 0xFF); out.write(p & 0xFF)
    }
    out.write(0x21); out.write(0xFF); out.write(11) // application extension
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16(loops); out.write(0)
    frames.foreach { case (delayCs, interlaced, idx) =>
      out.write(0x21); out.write(0xF9); out.write(4) // GCE
      out.write(0); u16(delayCs); out.write(0); out.write(0)
      writeImageBlock(out, w, h, interlaced, idx)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** One frame spec for [[encodeComposite]]: an image RECT inside the
    * logical screen, its GCE disposal method and transparent index
    * (-1 = none), and the rect-local pixel function. */
  final case class FrameSpec(left: Int, top: Int, w: Int, h: Int,
                             delayCs: Int, disposal: Int, transIdx: Int,
                             idx: (Int, Int) => Int)

  /** Encode a COMPOSITING GIF89a: sub-canvas frame rects with disposal
    * methods and transparency — the full animation semantics. */
  def encodeComposite(screenW: Int, screenH: Int, bgIndex: Int,
                      palette: Array[Int], loops: Int,
                      frames: Seq[FrameSpec]): Array[Byte] = {
    require(palette.length == 256 && frames.nonEmpty)
    frames.foreach { f =>
      require(f.left + f.w <= screenW && f.top + f.h <= screenH,
        "frame rect must sit inside the logical screen")
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(screenW); u16(screenH)
    out.write(0xF7); out.write(bgIndex); out.write(0)
    palette.foreach { p =>
      out.write((p >> 16) & 0xFF); out.write((p >> 8) & 0xFF); out.write(p & 0xFF)
    }
    out.write(0x21); out.write(0xFF); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16(loops); out.write(0)
    frames.foreach { f =>
      out.write(0x21); out.write(0xF9); out.write(4) // GCE
      out.write(((f.disposal & 7) << 2) | (if (f.transIdx >= 0) 1 else 0))
      u16(f.delayCs)
      out.write(if (f.transIdx >= 0) f.transIdx else 0)
      out.write(0)
      writeImageBlock(out, f.w, f.h, interlaced = false, f.idx, f.left, f.top)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Replay the CANVAS across an animation — the real GIF semantics:
    * the canvas starts as the background index; each frame draws its
    * rect over it (transparent-index pixels show THROUGH to what is
    * already there), the composited canvas is emitted, then the
    * disposal applies — 0/1 keep, 2 restores the background over the
    * frame's rect, 3 restores the canvas as it was before the frame.
    * Returns one positional checksum per frame over the composited
    * index canvas: Σ (idx+1)·(f·W·H + y·W + x + 1). Index space (the
    * fixtures use the global table; mixing local tables would need RGB
    * space — out of scope, spec'd). */
  def compositedChecksums(a: Animation): Seq[Long] = {
    val n = a.screenW * a.screenH
    val canvas = Array.fill(n)(a.bgIndex)
    val out = Seq.newBuilder[Long]
    var f = 0
    a.frames.foreach { fr =>
      val before = if (fr.disposal == 3) canvas.clone() else null
      var iy = 0
      while (iy < fr.height) {
        var ix = 0
        while (ix < fr.width) {
          val v = fr.indices(iy * fr.width + ix)
          if (v != fr.transIdx)
            canvas((fr.top + iy) * a.screenW + (fr.left + ix)) = v
          ix += 1
        }
        iy += 1
      }
      var ck = 0L
      var i = 0
      val base = f.toLong * n
      while (i < n) { ck += (canvas(i) + 1).toLong * (base + i + 1); i += 1 }
      out += ck
      fr.disposal match {
        case 2 =>
          var iy2 = 0
          while (iy2 < fr.height) {
            var ix2 = 0
            while (ix2 < fr.width) {
              canvas((fr.top + iy2) * a.screenW + (fr.left + ix2)) = a.bgIndex
              ix2 += 1
            }
            iy2 += 1
          }
        case 3 => System.arraycopy(before, 0, canvas, 0, n)
        case _ => ()
      }
      f += 1
    }
    out.result()
  }

  final case class Decoded(width: Int, height: Int, interlaced: Boolean,
                           indices: Array[Int], palette: Array[Int])

  /** One animation frame: the decoded raster plus its canvas geometry
    * (left/top of the image rect), the Graphic Control Extension state
    * that preceded it — delay (centiseconds, 0 when none), disposal
    * method (0 none / 1 keep / 2 restore-background / 3
    * restore-previous), transparent index (-1 when none). */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
                         interlaced: Boolean, delayCs: Int, disposal: Int,
                         transIdx: Int, indices: Array[Int],
                         palette: Array[Int])

  /** A decoded GIF stream: every image block in order, the logical
    * screen, the background color index, and the NETSCAPE 2.0 loop
    * count (-1 when the extension is absent; 0 on the wire means loop
    * forever). Frames decode as independent rect rasters;
    * [[compositedChecksums]] replays the canvas. */
  final case class Animation(screenW: Int, screenH: Int, bgIndex: Int,
                             frames: Seq[Frame], loops: Int)

  /** Full decode of a GIF87a/89a stream: header + logical screen,
    * global color table, extension walk (GCE delays captured, NETSCAPE
    * loop count parsed, the rest skipped), every image descriptor
    * (local table honored if present), sub-block reassembly, LZW
    * decode, deinterlace. None on any malformed byte — a corrupt crawl
    * payload must grade, not throw. */
  def decodeAnimation(bytes: Array[Byte]): Option[Animation] = try {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var pos = 6
    def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8); pos += 2; v }
    val screenW = u16(); val screenH = u16()
    val packed = u8()
    val bgIndex = u8(); u8() // background index, aspect
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      palette = Array.tabulate(n) { i =>
        ((bytes(pos + 3 * i) & 0xFF) << 16) | ((bytes(pos + 3 * i + 1) & 0xFF) << 8) |
          (bytes(pos + 3 * i + 2) & 0xFF)
      }
      pos += 3 * n
    }
    val frames = Seq.newBuilder[Frame]
    var nFrames = 0
    var pendingDelay = 0
    var pendingDisposal = 0
    var pendingTrans = -1
    var loops = -1
    var sawTrailer = false
    while (pos < bytes.length && !sawTrailer) {
      u8() match {
        case 0x21 => // extension: label, then sub-blocks to a 0 terminator
          val label = u8()
          if (label == 0xF9) { // Graphic Control Extension
            if (u8() != 4) return None
            val gpacked = u8()
            pendingDisposal = (gpacked >> 2) & 7
            pendingDelay = u16()
            val tIdx = u8()
            pendingTrans = if ((gpacked & 1) != 0) tIdx else -1
            if (u8() != 0) return None
          } else if (label == 0xFF) { // application extension
            val n = u8()
            val app = new String(bytes, pos, n, "US-ASCII"); pos += n
            var m = u8()
            while (m != 0) {
              if (app.startsWith("NETSCAPE") && m == 3 && (bytes(pos) & 0xFF) == 1)
                loops = (bytes(pos + 1) & 0xFF) | ((bytes(pos + 2) & 0xFF) << 8)
              pos += m; m = u8()
            }
          } else {
            var n = u8()
            while (n != 0) { pos += n; n = u8() }
          }
        case 0x2C =>
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          // allocation-bomb guard: flipped dimension bytes must not
          // demand a multi-GB raster — degrade, never allocate blind
          if (w.toLong * h > 64000000L) return None
          // GIF89a §20: the image rect must lie inside the logical
          // screen; a hostile rect would index outside the compositing
          // canvas downstream — degrade here, inside the None contract
          if (left + w > screenW || top + h > screenH) return None
          val ipacked = u8()
          val interlaced = (ipacked & 0x40) != 0
          var framePalette = palette
          if ((ipacked & 0x80) != 0) { // local color table wins
            val n = 2 << (ipacked & 7)
            framePalette = Array.tabulate(n) { i =>
              ((bytes(pos + 3 * i) & 0xFF) << 16) | ((bytes(pos + 3 * i + 1) & 0xFF) << 8) |
                (bytes(pos + 3 * i + 2) & 0xFF)
            }
            pos += 3 * n
          }
          if (framePalette == null || w <= 0 || h <= 0) return None
          val minCode = u8()
          if (minCode < 2 || minCode > 11) return None
          val stream = new java.io.ByteArrayOutputStream()
          var n = u8()
          while (n != 0) { stream.write(bytes, pos, n); pos += n; n = u8() }
          val transmitted = lzwDecode(minCode, stream.toByteArray, w * h) match {
            case Some(ind) if ind.length == w * h => ind
            case _ => return None
          }
          if (transmitted.exists(_ >= framePalette.length)) return None
          val indices =
            if (!interlaced) transmitted
            else {
              val raster = new Array[Int](w * h)
              val rows = interlaceRows(h)
              var r = 0
              while (r < rows.length) {
                System.arraycopy(transmitted, r * w, raster, rows(r) * w, w)
                r += 1
              }
              raster
            }
          frames += Frame(left, top, w, h, interlaced, pendingDelay,
            pendingDisposal, pendingTrans, indices, framePalette)
          nFrames += 1
          pendingDelay = 0; pendingDisposal = 0; pendingTrans = -1
        case 0x3B => sawTrailer = true
        case _ => return None
      }
    }
    if (nFrames == 0) None
    else Some(Animation(screenW, screenH, bgIndex, frames.result(), loops))
  } catch { case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None }

  /** First-frame view (the still-image contract the single-image
    * queries grade). */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    decodeAnimation(bytes).map { a =>
      val f = a.frames.head
      Decoded(f.width, f.height, f.interlaced, f.indices, f.palette)
    }

  // ------------------------------------------------------------------
  // fixtures + graded query
  // ------------------------------------------------------------------

  def fxW(id: Long): Int = floorMod(id, 12).toInt + 20
  def fxH(id: Long): Int = floorMod(id, 9).toInt + 16
  def fxInterlaced(id: Long): Boolean = floorMod(id, 2) == 1
  def fxIdx(id: Long, x: Int, y: Int): Int =
    floorMod(3 * x + 7 * y + id * 11, 256).toInt

  /** The fixture palette: entry i = (i, 7i mod 256, 13i mod 256) — the
    * identity red channel lets the oracle reason in indices. */
  val FixturePalette: Array[Int] = Array.tabulate(256) { i =>
    (i << 16) | (floorMod(i * 7, 256) << 8) | floorMod(i * 13, 256)
  }

  def syntheticGif(id: Long): Array[Byte] =
    encode(fxW(id), fxH(id), fxInterlaced(id), FixturePalette, (x, y) => fxIdx(id, x, y))

  final case class GifFeatures(media_id: Long, width: Long, height: Long,
                               interlaced: Boolean, n_colors: Long, checksum: Long,
                               mean_r: Long, mean_g: Long, mean_b: Long)

  /** Decode one record to its graded features: exact integer channel
    * means, distinct-color count, and a POSITIONAL checksum
    * `Σ (r+1)·(y·w+x+1)` that any deinterlace or row-order fault
    * scrambles (channel means alone are row-order blind). */
  def decodeFeatures(id: Long, payload: Array[Byte]): GifFeatures = decode(payload) match {
    case None => GifFeatures(id, -1L, -1L, interlaced = false, -1L, -1L, -1L, -1L, -1L)
    case Some(d) =>
      val n = d.width * d.height
      var sr, sg, sb, ck = 0L
      val seen = new Array[Boolean](256)
      var colors = 0
      var i = 0
      while (i < n) {
        val rgb = d.palette(d.indices(i))
        val r = (rgb >> 16) & 0xFF
        sr += r; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        ck += (r + 1).toLong * (i + 1)
        if (!seen(d.indices(i))) { seen(d.indices(i)) = true; colors += 1 }
        i += 1
      }
      GifFeatures(id, d.width.toLong, d.height.toLong, d.interlaced,
        colors.toLong, ck, sr / n, sg / n, sb / n)
  }

  /** End-to-end GIF features query: real fixtures through the real LZW
    * decode, partition-wise like every codec. */
  def gifQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => decodeFeatures(id, syntheticGif(id))))
      .toDF().orderBy("media_id")
  }

  // ------------------------------------------------ animation fixtures

  def fxAnimFrames(id: Long): Int = floorMod(id, 4).toInt + 2
  def fxAnimDelay(id: Long, f: Int): Int = (f + 1) * 10 + floorMod(id, 7).toInt
  def fxAnimLoops(id: Long): Int = floorMod(id, 3).toInt
  def fxAnimIdx(id: Long, f: Int, x: Int, y: Int): Int =
    floorMod(3 * x + 7 * y + id * 11 + f * 5, 256).toInt

  /** Animated fixture: 2–5 full-canvas frames, per-frame delays and
    * alternating interlace, NETSCAPE loop count — closed-form in the
    * id, mirrored by the oracle. */
  def syntheticGifAnim(id: Long): Array[Byte] =
    encodeAnimated(fxW(id), fxH(id), FixturePalette, fxAnimLoops(id),
      Seq.tabulate(fxAnimFrames(id))(f =>
        (fxAnimDelay(id, f), floorMod(id + f, 2) == 1,
          (x: Int, y: Int) => fxAnimIdx(id, f, x, y))))

  final case class GifAnimFeatures(media_id: Long, n_frames: Long, loops: Long,
                                   total_delay_cs: Long, checksum: Long)

  /** Per-animation features: frame count, loop count, total duration,
    * and a positional checksum running ACROSS frames (frame f's pixel i
    * weighs at position f·w·h + i + 1) — a decoder that drops, reorders
    * or double-decodes any frame scrambles it. */
  def animFeatures(id: Long, payload: Array[Byte]): GifAnimFeatures =
    decodeAnimation(payload) match {
      case None => GifAnimFeatures(id, -1L, -1L, -1L, -1L)
      case Some(a) =>
        var ck = 0L
        var base = 0L
        a.frames.foreach { fr =>
          val n = fr.width * fr.height
          var i = 0
          while (i < n) {
            val r = (fr.palette(fr.indices(i)) >> 16) & 0xFF
            ck += (r + 1).toLong * (base + i + 1)
            i += 1
          }
          base += n
        }
        GifAnimFeatures(id, a.frames.length.toLong, a.loops.toLong,
          a.frames.map(_.delayCs.toLong).sum, ck)
    }

  /** End-to-end animated-GIF query, partition-wise like every codec. */
  def gifAnimQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => animFeatures(id, syntheticGifAnim(id))))
      .toDF().orderBy("media_id")
  }

  // --------------------------------------------- compositing fixtures

  /** The compositing fixture's three frames (rect-LOCAL pixel
    * functions): a full-canvas base (keep), a transparent-holed rect
    * with restore-background disposal, and an overlapping second rect —
    * so the graded canvases exercise draw-through, restore, and
    * overlap, all closed-form. */
  def fxCompSpecs(id: Long): Seq[FrameSpec] = {
    val w = fxW(id); val h = fxH(id)
    Seq(
      FrameSpec(0, 0, w, h, 10, 1, -1,
        (x, y) => fxAnimIdx(id, 0, x, y)),
      FrameSpec(2, 3, w / 2, h / 2, 20, 2, 7,
        (x, y) => floorMod(3 * x + 7 * y + id, 16).toInt),
      FrameSpec(1, 1, w / 3, h / 3, 30, 1, -1,
        (x, y) => floorMod(x + 2 * y + id, 32).toInt))
  }

  def syntheticGifComposite(id: Long): Array[Byte] =
    encodeComposite(fxW(id), fxH(id), bgIndex = 0, FixturePalette,
      loops = 1, fxCompSpecs(id))

  final case class GifCompositeRow(media_id: Long, frame_no: Long, checksum: Long)

  /** Graded query: the COMPOSITED canvas per frame — real GIF animation
    * semantics (draw-through transparency, restore-background disposal,
    * overlapping rects), one positional checksum per emitted canvas. */
  def gifCompositeQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        decodeAnimation(syntheticGifComposite(id)) match {
          case None => Iterator.single(GifCompositeRow(id, -1L, -1L))
          case Some(a) => compositedChecksums(a).iterator.zipWithIndex
            .map { case (ck, f) => GifCompositeRow(id, f.toLong, ck) }
        }
      })
      .toDF().orderBy("media_id", "frame_no")
  }
}
