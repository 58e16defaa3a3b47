package graft.ext

/** JPEG codec (ITU T.81 subset), self-contained.
  *
  * Scope: 8-bit DCT, Huffman entropy coding, 1 or 3 components,
  * sampling factors up to 2 (covers 4:4:4 and 4:2:0), DRI/RST0-7
  * restart intervals (byte-aligned predictor resets — the
  * error-resilience structure camera and web encoders emit), BASELINE
  * sequential (SOF0) AND PROGRESSIVE (SOF2: spectral selection +
  * successive approximation, multi-scan) — together the shape of
  * essentially all crawl images. The encoder exists to plant REAL
  * entropy-coded fixtures (and to round-trip-test the decoder); the
  * decoder is general over anything the format subset allows: it reads
  * quantization and Huffman tables from the stream (canonical-code
  * reconstruction from the DHT bits/values lists), walks MCUs with
  * per-component DC prediction, dequantizes, runs the IDCT and
  * upsamples chroma by sampling-factor replication.
  *
  * Color contract (documented so a SQL oracle can replay it exactly, the
  * same convention as the sketch contract hashes — 16-bit fixed point,
  * arithmetic-shift rounding):
  * {{{
  *   y  =       (19595·r + 38470·g +  7471·b + 32768) >> 16
  *   cb = 128 + ((−11059·r − 21709·g + 32768·b + 32768) >> 16)
  *   cr = 128 + (( 32768·r − 27439·g −  5329·b + 32768) >> 16)
  *   r' = clamp(y + (( 91881·(cr−128)                  + 32768) >> 16))
  *   g' = clamp(y − (( 22554·(cb−128) + 46802·(cr−128) + 32768) >> 16))
  *   b' = clamp(y + ((116131·(cb−128)                  + 32768) >> 16))
  * }}}
  * With the all-ones quantization tables the encoder writes, a
  * constant-color image is DC-only and the decode is EXACT (the DCT of a
  * constant block has one integer coefficient), so decoded channel means
  * are a closed-form integer function of the input color — the graded
  * surface. For general images the round trip is bounded, spec-pinned.
  */
object Jpeg {

  def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    val cb = 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
    val cr = 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
    (clamp8(y), clamp8(cb), clamp8(cr))
  }

  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val r = y + ((91881 * (cr - 128) + 32768) >> 16)
    val g = y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
    val b = y + ((116131 * (cb - 128) + 32768) >> 16)
    (clamp8(r), clamp8(g), clamp8(b))
  }

  /** Zigzag scan order, generated (not transcribed): walk the 8×8
    * anti-diagonals, alternating direction. ZigZag(k) = raster index of
    * the k-th coefficient in scan order. */
  val ZigZag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    for (s <- 0 until 15) {
      val r0 = math.max(0, s - 7); val r1 = math.min(7, s)
      val rows = if (s % 2 == 0) r1 to r0 by -1 else r0 to r1
      for (r <- rows) { out(k) = r * 8 + (s - r); k += 1 }
    }
    out
  }

  // ---------------------------------------------------------------------
  // Huffman tables: canonical codes from (bits-per-length, values)
  // ---------------------------------------------------------------------

  /** A Huffman table as the DHT segment carries it: `bits(l)` = number
    * of codes of length l+1, `vals` = symbols in code order. */
  final case class HuffSpec(bits: Array[Int], vals: Array[Int])

  /** The codec's own tables (written to DHT, read back generically):
    * DC — 12 category symbols, all length 4 (Kraft 12/16 < 1, the
    * all-ones pattern stays unused as T.81 recommends); AC — all 162
    * (run,size) symbols plus EOB/ZRL, all length 8 (162/256 < 1). Flat
    * lengths are deliberately simple: the DECODER cannot assume them —
    * it rebuilds canonical codes from whatever the DHT declares. */
  val DcSpec: HuffSpec = HuffSpec(
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), (0 until 12).toArray)
  val AcSpec: HuffSpec = HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0),
    (0x00 +: (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size) :+ 0xF0)
      .sorted.toArray)

  /** AC table for PROGRESSIVE scans: the baseline AC alphabet plus the
    * EOBn symbols (r<<4, r=1..14) that batch end-of-band runs across
    * blocks — which the standard baseline table has no codes for. All
    * 176 symbols at length 8 (176/256 < 1); the decoder rebuilds from
    * the DHT and never assumes these lengths. */
  val ProgAcSpec: HuffSpec = HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0),
    ((0 to 14).map(_ << 4) ++ Seq(0xF0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size))
      .sorted.toArray)

  /** symbol -> (code, length), canonical assignment. */
  def encodeTable(spec: HuffSpec): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until spec.bits(l - 1)) {
        out += spec.vals(k) -> ((code, l)); code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Canonical decoder state: per length, the smallest code, largest
    * code (-1 when the length is unused) and index of its first value. */
  final class HuffDecoder(spec: HuffSpec) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    private var code = 0; private var k = 0
    for (l <- 1 to 16) {
      if (spec.bits(l - 1) > 0) {
        valPtr(l) = k; minCode(l) = code
        code += spec.bits(l - 1); k += spec.bits(l - 1)
        maxCode(l) = code - 1
      }
      code <<= 1
    }
    def decode(in: BitReader): Int = {
      var c = 0; var l = 0
      while (l < 16) {
        c = (c << 1) | in.readBit(); l += 1
        if (maxCode(l) >= c && minCode(l) <= c)
          return spec.vals(valPtr(l) + c - minCode(l))
      }
      throw new IllegalStateException("jpeg: invalid Huffman code")
    }
  }

  // ---------------------------------------------------------------------
  // Scan bit IO (MSB first, 0xFF byte stuffing)
  // ---------------------------------------------------------------------

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def putBits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1); n += 1
        if (n == 8) {
          out.write(cur)
          if (cur == 0xFF) out.write(0x00) // stuff
          cur = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the trailing partial byte with 1-bits (T.81 F.1.2.3); a pad
      * byte that lands on 0xFF is stuffed like any data byte. */
    def align(): Unit =
      if (n > 0) { cur = (cur << (8 - n)) | ((1 << (8 - n)) - 1); out.write(cur)
        if (cur == 0xFF) out.write(0x00); cur = 0; n = 0 }
    /** Emit marker bytes verbatim (RSTn — markers are never stuffed).
      * Callers must [[align]] first. */
    def rawMarker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def finish(): Array[Byte] = { align(); out.toByteArray }
  }

  final class BitReader(p: Array[Byte], start: Int) {
    private var pos = start
    private var cur = 0; private var n = 0
    /** Consume a restart marker at a byte-aligned boundary: drop the
      * pad bits of the current byte, expect FF D0+m. */
    def expectRst(m: Int): Boolean = {
      n = 0 // discard pad bits
      if (pos + 1 >= p.length) return false
      val ok = (p(pos) & 0xFF) == 0xFF && (p(pos + 1) & 0xFF) == (0xD0 + m)
      if (ok) pos += 2
      ok
    }
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= p.length) throw new IllegalStateException("jpeg: scan truncated")
        var b = p(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          if (pos >= p.length) throw new IllegalStateException("jpeg: scan truncated")
          val m = p(pos) & 0xFF
          if (m == 0x00) pos += 1 // stuffed literal 0xFF
          else if (m == 0xD9) throw new IllegalStateException("jpeg: EOI inside scan")
          else throw new IllegalStateException(f"jpeg: unexpected marker FF$m%02X in scan")
        }
        cur = b; n = 8
      }
      n -= 1
      (cur >>> n) & 1
    }
    def readBits(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte offset of the next unread scan byte, discarding pad bits of
      * the current byte — a progressive container parser resumes its
      * marker walk here after a scan's units are exhausted. */
    def finishScan(): Int = { n = 0; pos }
  }

  /** DC/AC magnitude category: bit length of |v| (0 for v = 0). */
  def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** The `size` extra bits carrying a signed value (T.81 F.1.2.1.3):
    * negatives are stored as v + 2^size − 1. */
  def signedBits(v: Int, size: Int): Int = if (v < 0) v + (1 << size) - 1 else v
  def extendSigned(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  // ---------------------------------------------------------------------
  // DCT
  // ---------------------------------------------------------------------

  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val C: Array[Double] = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Forward DCT of one level-shifted 8×8 block, rounded to integer
    * coefficients (quantization divisor 1 — the all-ones tables). */
  def fdct(block: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) { s += block(y * 8 + x) * Cos(x)(u) * Cos(y)(v); y += 1 }
          x += 1
        }
        out(v * 8 + u) = math.round(0.25 * C(u) * C(v) * s).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse DCT to level-shifted samples (caller adds 128 and clamps). */
  def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0; var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) { s += C(u) * C(v) * coef(v * 8 + u) * Cos(x)(u) * Cos(y)(v); v += 1 }
          u += 1
        }
        out(y * 8 + x) = math.round(0.25 * s).toInt
        y += 1
      }
      x += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // Encoder
  // ---------------------------------------------------------------------

  private def be16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xFF); o.write(v & 0xFF)
  }
  private def marker(o: java.io.ByteArrayOutputStream, m: Int): Unit = {
    o.write(0xFF); o.write(m)
  }

  /** Encode an image as baseline sequential JPEG. `rgb(x, y)` returns
    * packed 0xRRGGBB; `subsample420` selects 4:2:0 (2×2 luma blocks per
    * MCU, chroma averaged 2×2) vs 4:4:4. Quantization tables are all
    * ones — the fixture regime where constant blocks decode exactly.
    * `restartInterval` > 0 plants a DRI segment and RST0-7 markers every
    * that many MCUs (byte-aligned, DC predictors reset) — the
    * error-resilience structure most camera/web encoders emit. */
  def encode(w: Int, h: Int, rgb: (Int, Int) => Int, subsample420: Boolean,
             restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val hmax = if (subsample420) 2 else 1
    val mcuW = 8 * hmax; val mcuH = 8 * hmax
    val mcuCols = (w + mcuW - 1) / mcuW
    val mcuRows = (h + mcuH - 1) / mcuH
    val lumaW = mcuCols * mcuW; val lumaH = mcuRows * mcuH
    // edge-replicated full-res YCbCr planes
    val yP = new Array[Int](lumaW * lumaH)
    val cbF = new Array[Int](lumaW * lumaH)
    val crF = new Array[Int](lumaW * lumaH)
    var yy = 0
    while (yy < lumaH) {
      var xx = 0
      while (xx < lumaW) {
        val px = rgb(math.min(xx, w - 1), math.min(yy, h - 1))
        val (y0, cb0, cr0) = rgbToYcc((px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)
        yP(yy * lumaW + xx) = y0; cbF(yy * lumaW + xx) = cb0; crF(yy * lumaW + xx) = cr0
        xx += 1
      }
      yy += 1
    }
    val chromaW = lumaW / hmax; val chromaH = lumaH / hmax
    def subsample(full: Array[Int]): Array[Int] =
      if (!subsample420) full
      else Array.tabulate(chromaW * chromaH) { i =>
        val cx = (i % chromaW) * 2; val cy = (i / chromaW) * 2
        (full(cy * lumaW + cx) + full(cy * lumaW + cx + 1) +
          full((cy + 1) * lumaW + cx) + full((cy + 1) * lumaW + cx + 1) + 2) / 4
      }
    val cbP = subsample(cbF); val crP = subsample(crF)

    val o = new java.io.ByteArrayOutputStream()
    marker(o, 0xD8) // SOI
    // DQT: two all-ones tables (zigzag order is the wire order)
    for (tq <- 0 to 1) {
      marker(o, 0xDB); be16(o, 2 + 65); o.write(tq)
      var i = 0; while (i < 64) { o.write(1); i += 1 }
    }
    // SOF0
    marker(o, 0xC0); be16(o, 8 + 3 * 3); o.write(8)
    be16(o, h); be16(o, w); o.write(3)
    o.write(1); o.write((hmax << 4) | hmax); o.write(0) // Y
    o.write(2); o.write(0x11); o.write(1)               // Cb
    o.write(3); o.write(0x11); o.write(1)               // Cr
    // DHT: same specs for both table ids (still four declarations — the
    // decoder must read all of them)
    for ((cls, id, spec) <- Seq((0, 0, DcSpec), (1, 0, AcSpec), (0, 1, DcSpec), (1, 1, AcSpec))) {
      marker(o, 0xC4); be16(o, 2 + 1 + 16 + spec.vals.length)
      o.write((cls << 4) | id)
      spec.bits.foreach(o.write)
      spec.vals.foreach(o.write)
    }
    if (restartInterval > 0) { // DRI
      marker(o, 0xDD); be16(o, 4); be16(o, restartInterval)
    }
    // SOS
    marker(o, 0xDA); be16(o, 6 + 2 * 3); o.write(3)
    o.write(1); o.write(0x00) // Y: DC 0 / AC 0
    o.write(2); o.write(0x11) // Cb: DC 1 / AC 1
    o.write(3); o.write(0x11)
    o.write(0); o.write(63); o.write(0) // Ss, Se, Ah/Al

    val dcEnc = encodeTable(DcSpec); val acEnc = encodeTable(AcSpec)
    val bw = new BitWriter
    def writeBlock(plane: Array[Int], planeW: Int, x0: Int, y0: Int, pred: Int): Int = {
      val block = Array.tabulate(64)(i => plane(math.min(y0 + i / 8, (plane.length / planeW) - 1) * planeW
        + math.min(x0 + i % 8, planeW - 1)) - 128)
      val coef = fdct(block)
      val dc = coef(0)
      val diff = dc - pred
      val t = category(diff)
      val (dcCode, dcLen) = dcEnc(t)
      bw.putBits(dcCode, dcLen); if (t > 0) bw.putBits(signedBits(diff, t), t)
      // AC run-length over zigzag order. Baseline AC categories stop at
      // size 10 (T.81 table limit), so with all-ones quantization an
      // extreme coefficient is clamped to ±1023 — the same ceiling every
      // baseline encoder lives under.
      var run = 0; var k = 1
      while (k < 64) {
        val v0 = coef(ZigZag(k))
        val v = if (v0 > 1023) 1023 else if (v0 < -1023) -1023 else v0
        if (v == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = acEnc(0xF0); bw.putBits(c, l); run -= 16 }
          val s = category(v)
          val (c, l) = acEnc((run << 4) | s)
          bw.putBits(c, l); bw.putBits(signedBits(v, s), s)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = acEnc(0x00); bw.putBits(c, l) } // EOB
      dc
    }
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var mcuSeq = 0; var rstSeq = 0
    val totalMcus = mcuRows * mcuCols
    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        var by = 0
        while (by < hmax) {
          var bx = 0
          while (bx < hmax) {
            dcY = writeBlock(yP, lumaW, (mx * hmax + bx) * 8, (my * hmax + by) * 8, dcY)
            bx += 1
          }
          by += 1
        }
        dcCb = writeBlock(cbP, chromaW, mx * 8, my * 8, dcCb)
        dcCr = writeBlock(crP, chromaW, mx * 8, my * 8, dcCr)
        mcuSeq += 1
        if (restartInterval > 0 && mcuSeq % restartInterval == 0 && mcuSeq < totalMcus) {
          bw.align(); bw.rawMarker(0xD0 + (rstSeq % 8)); rstSeq += 1
          dcY = 0; dcCb = 0; dcCr = 0
        }
        mx += 1
      }
      my += 1
    }
    val scan = bw.finish()
    o.write(scan, 0, scan.length)
    marker(o, 0xD9) // EOI
    o.toByteArray
  }

  /** Encode a GRAYSCALE baseline JPEG (one component, no color
    * conversion — `lum(x, y)` is the sample). The 1-component scan is
    * its own decoder path (no chroma planes, no upsampling), graded via
    * the gray fixtures: decoded pixels are exactly the luma for
    * constant images. */
  def encodeGray(w: Int, h: Int, lum: (Int, Int) => Int,
                 restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val mcuCols = (w + 7) / 8; val mcuRows = (h + 7) / 8
    val planeW = mcuCols * 8; val planeH = mcuRows * 8
    val plane = Array.tabulate(planeW * planeH)(i =>
      clamp8(lum(math.min(i % planeW, w - 1), math.min(i / planeW, h - 1))))
    val o = new java.io.ByteArrayOutputStream()
    marker(o, 0xD8)
    marker(o, 0xDB); be16(o, 2 + 65); o.write(0)
    (0 until 64).foreach(_ => o.write(1))
    marker(o, 0xC0); be16(o, 8 + 3); o.write(8)
    be16(o, h); be16(o, w); o.write(1)
    o.write(1); o.write(0x11); o.write(0)
    for ((cls, spec) <- Seq((0, DcSpec), (1, AcSpec))) {
      marker(o, 0xC4); be16(o, 2 + 1 + 16 + spec.vals.length)
      o.write(cls << 4)
      spec.bits.foreach(o.write)
      spec.vals.foreach(o.write)
    }
    if (restartInterval > 0) { marker(o, 0xDD); be16(o, 4); be16(o, restartInterval) }
    marker(o, 0xDA); be16(o, 6 + 2); o.write(1)
    o.write(1); o.write(0x00)
    o.write(0); o.write(63); o.write(0)
    val dcEnc = encodeTable(DcSpec); val acEnc = encodeTable(AcSpec)
    val bw = new BitWriter
    var pred = 0; var mcuSeq = 0; var rstSeq = 0
    val totalMcus = mcuRows * mcuCols
    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        val block = Array.tabulate(64)(i =>
          plane((my * 8 + i / 8) * planeW + mx * 8 + i % 8) - 128)
        val coef = fdct(block)
        val diff = coef(0) - pred; pred = coef(0)
        val t = category(diff)
        val (dcCode, dcLen) = dcEnc(t)
        bw.putBits(dcCode, dcLen); if (t > 0) bw.putBits(signedBits(diff, t), t)
        var run = 0; var k = 1
        while (k < 64) {
          val v0 = coef(ZigZag(k))
          val v = if (v0 > 1023) 1023 else if (v0 < -1023) -1023 else v0
          if (v == 0) run += 1
          else {
            while (run >= 16) { val (c, l) = acEnc(0xF0); bw.putBits(c, l); run -= 16 }
            val s = category(v)
            val (c, l) = acEnc((run << 4) | s)
            bw.putBits(c, l); bw.putBits(signedBits(v, s), s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acEnc(0x00); bw.putBits(c, l) }
        mcuSeq += 1
        if (restartInterval > 0 && mcuSeq % restartInterval == 0 && mcuSeq < totalMcus) {
          bw.align(); bw.rawMarker(0xD0 + (rstSeq % 8)); rstSeq += 1; pred = 0
        }
        mx += 1
      }
      my += 1
    }
    val scan = bw.finish()
    o.write(scan, 0, scan.length)
    marker(o, 0xD9)
    o.toByteArray
  }

  // ---------------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------------

  final case class Component(id: Int, hi: Int, vi: Int, tq: Int,
                             var dcTbl: Int = 0, var acTbl: Int = 0)
  final case class Decoded(width: Int, height: Int, chroma: String, rgb: Array[Int])

  /** Full decode — baseline (SOF0) AND progressive (SOF2, spectral
    * selection + successive approximation, multi-scan); None when the
    * stream is outside the supported subset (arithmetic coding, >2
    * sampling factors, progressive WITH restart intervals, truncation,
    * bad codes …) — callers degrade to the SOF dimension scan. */
  def decode(p: Array[Byte]): Option[Decoded] = try {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    val qt = new Array[Array[Int]](4)
    val dcTbl = new Array[HuffSpec](4); val acTbl = new Array[HuffSpec](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    // progressive state: per-component quantized-coefficient stores over
    // the full MCU-padded block grid, accumulated across scans
    var progressive = false
    var stores: Array[Array[Array[Int]]] = null
    var storeBw: Array[Int] = null
    var mcuColsP = 0; var mcuRowsP = 0
    var scansSeen = 0
    var sosResume = -1
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      var j = i + 1
      while (j < p.length && (p(j) & 0xFF) == 0xFF) j += 1
      if (j >= p.length) return None
      val m = p(j) & 0xFF
      if (m == 0xD9) { // EOI: progressive reconstructs here; baseline has returned at SOS
        return if (progressive && scansSeen > 0)
          reconstructProgressive(w, h, comps, qt, stores, storeBw, mcuRowsP)
        else None
      }
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i = j + 1 }
      else {
        if (j + 2 >= p.length) return None
        val len = ((p(j + 1) & 0xFF) << 8) | (p(j + 2) & 0xFF)
        val seg = j + 3; val segEnd = j + 1 + len
        if (segEnd > p.length) return None
        m match {
          case 0xDB => // DQT (possibly several tables)
            var k = seg
            while (k < segEnd) {
              val pq = (p(k) & 0xFF) >> 4; val tq = p(k) & 0x0F
              if (pq != 0 || tq > 3) return None // 16-bit tables unsupported
              qt(tq) = Array.tabulate(64)(z => p(k + 1 + z) & 0xFF)
              k += 65
            }
          case 0xC4 => // DHT (possibly several tables)
            var k = seg
            while (k < segEnd) {
              val cls = (p(k) & 0xFF) >> 4; val id = p(k) & 0x0F
              if (cls > 1 || id > 3) return None
              val bits = Array.tabulate(16)(z => p(k + 1 + z) & 0xFF)
              val n = bits.sum
              val vals = Array.tabulate(n)(z => p(k + 17 + z) & 0xFF)
              val spec = HuffSpec(bits, vals)
              if (cls == 0) dcTbl(id) = spec else acTbl(id) = spec
              k += 17 + n
            }
          case 0xC0 | 0xC2 => // baseline / progressive SOF
            progressive = m == 0xC2
            if ((p(seg) & 0xFF) != 8) return None
            h = ((p(seg + 1) & 0xFF) << 8) | (p(seg + 2) & 0xFF)
            w = ((p(seg + 3) & 0xFF) << 8) | (p(seg + 4) & 0xFF)
            val nc = p(seg + 5) & 0xFF
            if (w == 0 || h == 0 || (nc != 1 && nc != 3)) return None
            // allocation-bomb guard: a flipped dimension byte must not
            // demand a multi-GB pixel store — beyond 64 MP is not a
            // crawl image, degrade (None) before any grid allocation
            if (w.toLong * h > 64000000L) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              Component(p(o) & 0xFF, (p(o + 1) & 0xFF) >> 4, p(o + 1) & 0x0F, p(o + 2) & 0xFF)
            }
            if (comps.exists(c => c.hi < 1 || c.hi > 2 || c.vi < 1 || c.vi > 2)) return None
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // unsupported frame type (arithmetic, lossless, …)
          case 0xDD =>
            restartInterval = ((p(seg) & 0xFF) << 8) | (p(seg + 1) & 0xFF)
          case 0xDA => // SOS — entropy data follows
            if (comps == null) return None
            val nc = p(seg) & 0xFF
            if (nc < 1 || nc > comps.length) return None
            val scanIdx = new Array[Int](nc)
            var c = 0
            while (c < nc) {
              val id = p(seg + 1 + 2 * c) & 0xFF
              val t = p(seg + 2 + 2 * c) & 0xFF
              val idx = comps.indexWhere(_.id == id)
              if (idx < 0) return None
              comps(idx).dcTbl = t >> 4; comps(idx).acTbl = t & 0x0F
              scanIdx(c) = idx
              c += 1
            }
            if (!progressive) {
              if (nc != comps.length) return None
              return decodeScan(p, segEnd, w, h, comps, qt, dcTbl, acTbl, restartInterval)
            }
            // progressive scan: fold into the coefficient stores and
            // resume the marker walk after the entropy data
            if (stores == null) {
              val hmax = comps.map(_.hi).max; val vmax = comps.map(_.vi).max
              mcuColsP = (w + 8 * hmax - 1) / (8 * hmax)
              mcuRowsP = (h + 8 * vmax - 1) / (8 * vmax)
              storeBw = comps.map(c => mcuColsP * c.hi)
              stores = comps.zipWithIndex.map { case (c, ci) =>
                Array.fill(storeBw(ci) * mcuRowsP * c.vi)(new Array[Int](64))
              }
            }
            val ss = p(seg + 1 + 2 * nc) & 0xFF
            val se = p(seg + 2 + 2 * nc) & 0xFF
            val ahal = p(seg + 3 + 2 * nc) & 0xFF
            sosResume = progDecodeScan(p, segEnd, comps, scanIdx, stores, storeBw,
              mcuColsP, mcuRowsP, w, h, ss, se, ahal >> 4, ahal & 0x0F,
              dcTbl, acTbl, restartInterval)
            scansSeen += 1
          case _ => () // APPn / COM / others: skip
        }
        i = if (sosResume >= 0) sosResume else segEnd
        sosResume = -1
      }
    }
    None
  } catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  private def decodeScan(p: Array[Byte], scanStart: Int, w: Int, h: Int,
                         comps: Array[Component], qt: Array[Array[Int]],
                         dcSpecs: Array[HuffSpec], acSpecs: Array[HuffSpec],
                         restartInterval: Int): Option[Decoded] = {
    val hmax = comps.map(_.hi).max; val vmax = comps.map(_.vi).max
    val mcuCols = (w + 8 * hmax - 1) / (8 * hmax)
    val mcuRows = (h + 8 * vmax - 1) / (8 * vmax)
    val planes = comps.map { c =>
      new Array[Int](mcuCols * c.hi * 8 * mcuRows * c.vi * 8)
    }
    val planeW = comps.map(c => mcuCols * c.hi * 8)
    if (comps.exists(c => dcSpecs(c.dcTbl) == null || acSpecs(c.acTbl) == null ||
        qt(c.tq) == null)) return None
    val dcDec = comps.map(c => new HuffDecoder(dcSpecs(c.dcTbl)))
    val acDec = comps.map(c => new HuffDecoder(acSpecs(c.acTbl)))
    val in = new BitReader(p, scanStart)
    val pred = new Array[Int](comps.length)
    var mcuSeq = 0; var rstSeq = 0
    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        if (restartInterval > 0 && mcuSeq > 0 && mcuSeq % restartInterval == 0) {
          if (!in.expectRst(rstSeq % 8)) return None
          rstSeq += 1
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci); val q = qt(c.tq)
          var by = 0
          while (by < c.vi) {
            var bx = 0
            while (bx < c.hi) {
              val coef = new Array[Int](64)
              val t = dcDec(ci).decode(in)
              if (t > 11) return None
              pred(ci) += extendSigned(in.readBits(t), t)
              coef(0) = pred(ci) * q(0)
              var k = 1
              while (k < 64) {
                val rs = acDec(ci).decode(in)
                if (rs == 0x00) k = 64 // EOB
                else if (rs == 0xF0) k += 16 // ZRL
                else {
                  k += rs >> 4
                  val s = rs & 0x0F
                  if (k > 63 || s == 0) return None
                  coef(ZigZag(k)) = extendSigned(in.readBits(s), s) * q(k)
                  k += 1
                }
              }
              val samples = idct(coef)
              val x0 = (mx * c.hi + bx) * 8; val y0 = (my * c.vi + by) * 8
              var sy = 0
              while (sy < 8) {
                var sx = 0
                while (sx < 8) {
                  planes(ci)((y0 + sy) * planeW(ci) + x0 + sx) =
                    clamp8(samples(sy * 8 + sx) + 128)
                  sx += 1
                }
                sy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcuSeq += 1
        mx += 1
      }
      my += 1
    }
    Some(assembleRgb(w, h, comps, planes, planeW))
  }

  /** Reassemble decoded sample planes into the RGB frame: nearest
    * (replication) upsampling by sampling factor, fixed-point YCbCr →
    * RGB, chroma-mode label. Shared by the baseline and progressive
    * paths. */
  private def assembleRgb(w: Int, h: Int, comps: Array[Component],
                          planes: Array[Array[Int]], planeW: Array[Int]): Decoded = {
    val hmax = comps.map(_.hi).max; val vmax = comps.map(_.vi).max
    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (comps.length == 1) {
          val v = planes(0)(y * planeW(0) + x)
          rgb(y * w + x) = (v << 16) | (v << 8) | v
        } else {
          def at(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.vi / vmax) * planeW(ci) + (x * c.hi / hmax))
          }
          val (r, g, b) = yccToRgb(at(0), at(1), at(2))
          rgb(y * w + x) = (r << 16) | (g << 8) | b
        }
        x += 1
      }
      y += 1
    }
    val chroma =
      if (comps.length == 1) "gray"
      else if (comps(0).hi == 2 && comps(0).vi == 2 && comps(1).hi == 1) "420"
      else if (comps.forall(c => c.hi == 1 && c.vi == 1)) "444"
      else s"${comps(0).hi}x${comps(0).vi}"
    Decoded(w, h, chroma, rgb)
  }

  // ---------------------------------------------------------------------
  // Progressive (SOF2): multi-scan coefficient accumulation
  // ---------------------------------------------------------------------

  /** A component's block grid for a NON-interleaved scan: the component's
    * own dimensions in 8×8 blocks — which can be SMALLER than the
    * MCU-padded store grid (the classic progressive trap: a 20×20 4:2:0
    * luma stores 4×4 blocks but single-component scans code only 3×3). */
  private def cropGrid(w: Int, h: Int, c: Component, hmax: Int, vmax: Int): (Int, Int) =
    (((w * c.hi + hmax - 1) / hmax + 7) / 8, ((h * c.vi + vmax - 1) / vmax + 7) / 8)

  /** Decode ONE progressive scan into the coefficient stores; returns
    * the byte offset where the container's marker walk resumes. DC
    * scans (Ss=0): Huffman diffs shifted by Al on the first pass, one
    * appended bit per block on refinement — both in interleaved MCU
    * order (Ns>1) or the component's crop-grid raster (Ns=1). AC scans
    * (always Ns=1): spectral band [Ss,Se] with EOBn run batching on the
    * first pass; the refinement pass replays T.81 G.7 — correction bits
    * for every nonzero-history coefficient crossed, ±1<<Al insertions,
    * EOB runs whose trailing bits carry the run's buffered corrections. */
  private def progDecodeScan(p: Array[Byte], scanStart: Int, comps: Array[Component],
                             scanIdx: Array[Int], stores: Array[Array[Array[Int]]],
                             storeBw: Array[Int], mcuCols: Int, mcuRows: Int,
                             w: Int, h: Int, ss: Int, se: Int, ah: Int, al: Int,
                             dcSpecs: Array[HuffSpec], acSpecs: Array[HuffSpec],
                             restartInterval: Int): Int = {
    val in = new BitReader(p, scanStart)
    val hmax = comps.map(_.hi).max; val vmax = comps.map(_.vi).max
    def fail(msg: String): Nothing = throw new IllegalStateException(s"jpeg: $msg")
    // restart units: MCUs for the interleaved DC scan, crop blocks for
    // every non-interleaved scan; DC predictors and the EOB run reset
    var unitSeq = 0; var rstSeq = 0
    def unitBoundary(reset: () => Unit): Unit = {
      if (restartInterval > 0 && unitSeq > 0 && unitSeq % restartInterval == 0) {
        if (!in.expectRst(rstSeq % 8)) fail("missing restart marker")
        rstSeq += 1; reset()
      }
      unitSeq += 1
    }
    if (ss == 0) {
      if (se != 0) fail("DC scan with Se != 0")
      // block visit order: interleaved MCU order, or crop raster for Ns=1
      def forEachDcBlock(onUnit: () => Unit)(f: (Int, Array[Int]) => Unit): Unit =
        if (scanIdx.length > 1) {
          var my = 0
          while (my < mcuRows) {
            var mx = 0
            while (mx < mcuCols) {
              onUnit()
              var si = 0
              while (si < scanIdx.length) {
                val ci = scanIdx(si); val c = comps(ci)
                var by = 0
                while (by < c.vi) {
                  var bx = 0
                  while (bx < c.hi) {
                    f(si, stores(ci)((my * c.vi + by) * storeBw(ci) + mx * c.hi + bx))
                    bx += 1
                  }
                  by += 1
                }
                si += 1
              }
              mx += 1
            }
            my += 1
          }
        } else {
          val ci = scanIdx(0)
          val (cbw, cbh) = cropGrid(w, h, comps(ci), hmax, vmax)
          var by = 0
          while (by < cbh) {
            var bx = 0
            while (bx < cbw) {
              onUnit(); f(0, stores(ci)(by * storeBw(ci) + bx)); bx += 1
            }
            by += 1
          }
        }
      if (ah == 0) {
        val dcDec = scanIdx.map(ci => new HuffDecoder(dcSpecs(comps(ci).dcTbl)))
        val pred = new Array[Int](scanIdx.length)
        forEachDcBlock(() => unitBoundary(() => java.util.Arrays.fill(pred, 0))) { (si, coef) =>
          val t = dcDec(si).decode(in)
          if (t > 11) fail("bad DC category")
          pred(si) += extendSigned(in.readBits(t), t)
          coef(0) = pred(si) << al
        }
      } else {
        forEachDcBlock(() => unitBoundary(() => ())) { (_, coef) =>
          coef(0) |= in.readBit() << al
        }
      }
    } else {
      if (scanIdx.length != 1) fail("interleaved AC scan")
      if (se > 63 || ss > se) fail("bad spectral band")
      val ci = scanIdx(0)
      val acDec = new HuffDecoder(acSpecs(comps(ci).acTbl))
      val (cbw, cbh) = cropGrid(w, h, comps(ci), hmax, vmax)
      var eobrun = 0
      var b = 0
      while (b < cbw * cbh) {
        unitBoundary(() => { eobrun = 0 })
        val coef = stores(ci)((b / cbw) * storeBw(ci) + b % cbw)
        if (ah == 0) { // first pass for this band
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = acDec.decode(in); val r = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) - 1
                  if (r > 0) eobrun += in.readBits(r)
                  k = 64
                }
              } else {
                k += r
                if (k > se) fail("AC coefficient past band end")
                coef(ZigZag(k)) = extendSigned(in.readBits(s), s) << al
                k += 1
              }
            }
          }
        } else { // refinement pass (T.81 G.7 control flow)
          val p1 = 1 << al; val m1 = -1 << al
          def correct(pos: Int): Unit =
            if (in.readBit() == 1 && (coef(pos) & p1) == 0)
              coef(pos) += (if (coef(pos) >= 0) p1 else m1)
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = acDec.decode(in); var r = rs >> 4; val s = rs & 15
              var newVal = 0
              if (s != 0) {
                if (s != 1) fail("refinement magnitude != 1")
                newVal = if (in.readBit() == 1) p1 else m1
              } else if (r != 15) {
                eobrun = 1 << r
                if (r > 0) eobrun += in.readBits(r)
                brk = true
              }
              if (!brk) {
                // advance over r zero-HISTORY coefficients, correcting
                // nonzero-history ones crossed (one bit each)
                var inner = true
                while (inner && k <= se) {
                  val pos = ZigZag(k)
                  if (coef(pos) != 0) { correct(pos); k += 1 }
                  else {
                    r -= 1
                    if (r < 0) inner = false else k += 1
                  }
                }
                if (s != 0 && k <= se) coef(ZigZag(k)) = newVal
                k += 1
              }
            }
          }
          if (eobrun > 0) { // band remainder: corrections only
            while (k <= se) {
              val pos = ZigZag(k)
              if (coef(pos) != 0) correct(pos)
              k += 1
            }
            eobrun -= 1
          }
        }
        b += 1
      }
    }
    in.finishScan()
  }

  /** Dequantize + IDCT the accumulated progressive coefficients and
    * assemble the frame (same plane/upsample/color tail as baseline). */
  private def reconstructProgressive(w: Int, h: Int, comps: Array[Component],
                                     qt: Array[Array[Int]],
                                     stores: Array[Array[Array[Int]]],
                                     storeBw: Array[Int],
                                     mcuRows: Int): Option[Decoded] = {
    if (comps.exists(c => qt(c.tq) == null)) return None
    val planeW = storeBw.map(_ * 8)
    val planes = comps.indices.map { ci =>
      new Array[Int](planeW(ci) * mcuRows * comps(ci).vi * 8)
    }.toArray
    var ci = 0
    while (ci < comps.length) {
      val q = qt(comps(ci).tq)
      val qNat = new Array[Int](64)
      var k = 0
      while (k < 64) { qNat(ZigZag(k)) = q(k); k += 1 }
      val bw = storeBw(ci)
      var b = 0
      while (b < stores(ci).length) {
        val coef = stores(ci)(b)
        val deq = new Array[Int](64)
        var z = 0
        while (z < 64) { deq(z) = coef(z) * qNat(z); z += 1 }
        val samples = idct(deq)
        val x0 = (b % bw) * 8; val y0 = (b / bw) * 8
        var sy = 0
        while (sy < 8) {
          var sx = 0
          while (sx < 8) {
            planes(ci)((y0 + sy) * planeW(ci) + x0 + sx) =
              clamp8(samples(sy * 8 + sx) + 128)
            sx += 1
          }
          sy += 1
        }
        b += 1
      }
      ci += 1
    }
    Some(assembleRgb(w, h, comps, planes, planeW))
  }

  // ---------------------------------------------------------------------
  // Progressive (SOF2): encoder — plants the multi-scan fixtures
  // ---------------------------------------------------------------------

  /** FDCT every 8×8 block of an MCU-padded plane; blocks in raster
    * order, coefficients in natural (row-major) order. */
  private def planeCoefBlocks(plane: Array[Int], planeW: Int,
                              blocksW: Int, blocksH: Int): Array[Array[Int]] =
    Array.tabulate(blocksW * blocksH) { b =>
      val x0 = (b % blocksW) * 8; val y0 = (b / blocksW) * 8
      fdct(Array.tabulate(64)(i => plane((y0 + i / 8) * planeW + x0 + i % 8) - 128))
    }

  /** AC-scan run state for progressive emission. Two correction-bit
    * regions, exactly T.81 G.1.2.3 / libjpeg's BE+BR split: `be` holds
    * bits promoted from blocks that ENDED inside the pending EOB run
    * (flushed with the EOBn symbol), `br` the current block's bits since
    * its last emitted code (flushed right after that code). Collapsing
    * them into one buffer misorders bits across run boundaries — the
    * subtlest framing bug in a progressive encoder. */
  private final class AcRunState(bw: BitWriter, acEnc: Map[Int, (Int, Int)]) {
    private var eobrun = 0
    private val be = new scala.collection.mutable.ArrayBuffer[Int]
    private val br = new scala.collection.mutable.ArrayBuffer[Int]
    def symbol(sym: Int): Unit = { val (c, l) = acEnc(sym); bw.putBits(c, l) }
    def bufferCorr(bit: Int): Unit = br += bit
    def flushBr(): Unit = { br.foreach(b => bw.putBits(b, 1)); br.clear() }
    def emitPendingEob(): Unit = if (eobrun > 0) {
      val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
      symbol(nbits << 4)
      if (nbits > 0) bw.putBits(eobrun - (1 << nbits), nbits)
      be.foreach(b => bw.putBits(b, 1)); be.clear()
      eobrun = 0
    }
    def endBlockInEob(): Unit = {
      eobrun += 1
      be ++= br; br.clear()
      if (eobrun == 16383) emitPendingEob() // table carries EOBn up to r=14
    }
    def brNonEmpty: Boolean = br.nonEmpty
  }

  /** Byte-align and plant RSTn at a restart boundary; AC scans must
    * flush their pending EOB run (+ its buffered correction bits) FIRST
    * — a run can never cross a restart. */
  private final class RstEmitter(bw: BitWriter, ri: Int) {
    private var seq = 0; private var rst = 0
    def atBoundary(flush: () => Unit): Boolean =
      if (ri > 0 && seq > 0 && seq % ri == 0) {
        flush(); bw.align(); bw.rawMarker(0xD0 + rst % 8); rst += 1; seq += 1; true
      } else { seq += 1; false }
  }

  private def emitAcFirstScan(bw: BitWriter, acEnc: Map[Int, (Int, Int)],
                              blocks: IndexedSeq[Array[Int]],
                              ss: Int, se: Int, al: Int, ri: Int): Unit = {
    require(al >= 1, "fixture AC-first scans use Al >= 1 (keeps categories <= 10)")
    val st = new AcRunState(bw, acEnc)
    val rste = new RstEmitter(bw, ri)
    for (coef <- blocks) {
      rste.atBoundary(() => st.emitPendingEob())
      var r = 0
      var k = ss
      while (k <= se) {
        val v = coef(ZigZag(k)) / (1 << al) // AC point transform truncates toward zero
        if (v == 0) r += 1
        else {
          st.emitPendingEob()
          while (r > 15) { st.symbol(0xF0); r -= 16 }
          val s = category(v)
          st.symbol((r << 4) | s)
          bw.putBits(signedBits(v, s), s)
          r = 0
        }
        k += 1
      }
      if (r > 0) st.endBlockInEob()
    }
    st.emitPendingEob()
  }

  private def emitAcRefineScan(bw: BitWriter, acEnc: Map[Int, (Int, Int)],
                               blocks: IndexedSeq[Array[Int]],
                               ss: Int, se: Int, al: Int, ri: Int): Unit = {
    val st = new AcRunState(bw, acEnc)
    val rste = new RstEmitter(bw, ri)
    val t = new Array[Int](64)
    for (coef <- blocks) {
      rste.atBoundary(() => st.emitPendingEob())
      var eob = ss - 1
      var k = ss
      while (k <= se) {
        val v = math.abs(coef(ZigZag(k))) >> al
        t(k) = v
        if (v == 1) eob = k // last NEWLY-significant position
        k += 1
      }
      var r = 0
      k = ss
      while (k <= se) {
        val temp = t(k)
        if (temp == 0) r += 1
        else {
          // ZRLs only when a new-significant lies ahead; trailing zeros
          // fold into the EOB run
          while (r > 15 && k <= eob) {
            st.emitPendingEob(); st.symbol(0xF0); r -= 16; st.flushBr()
          }
          if (temp > 1) st.bufferCorr(temp & 1) // history coef: correction bit
          else {
            st.emitPendingEob()
            st.symbol((r << 4) | 1)
            bw.putBits(if (coef(ZigZag(k)) < 0) 0 else 1, 1)
            st.flushBr()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || st.brNonEmpty) st.endBlockInEob()
    }
    st.emitPendingEob()
  }

  /** The fixture scan script: DC first (Al=1, interleaved), per-comp AC
    * first in two spectral bands (Al=1), DC refinement, per-comp AC
    * refinement over the full band — every progressive mechanism (band
    * split, both approximation passes, EOBn batching) in five (gray) or
    * eleven (color) scans. */
  private def writeProgressive(w: Int, h: Int,
                               comps: Seq[(Int, Int, Int, Array[Array[Int]])],
                               mcuCols: Int, mcuRows: Int,
                               restartInterval: Int = 0): Array[Byte] = {
    val hmax = comps.map(_._2).max; val vmax = comps.map(_._3).max
    val o = new java.io.ByteArrayOutputStream()
    marker(o, 0xD8)
    marker(o, 0xDB); be16(o, 2 + 65); o.write(0)
    (0 until 64).foreach(_ => o.write(1))
    marker(o, 0xC2); be16(o, 8 + 3 * comps.size); o.write(8)
    be16(o, h); be16(o, w); o.write(comps.size)
    comps.foreach { case (id, hi, vi, _) =>
      o.write(id); o.write((hi << 4) | vi); o.write(0)
    }
    for ((cls, spec) <- Seq((0, DcSpec), (1, ProgAcSpec))) {
      marker(o, 0xC4); be16(o, 2 + 1 + 16 + spec.vals.length)
      o.write(cls << 4)
      spec.bits.foreach(o.write)
      spec.vals.foreach(o.write)
    }
    if (restartInterval > 0) { marker(o, 0xDD); be16(o, 4); be16(o, restartInterval) }
    val dcEnc = encodeTable(DcSpec); val acEnc = encodeTable(ProgAcSpec)
    def sos(scanComps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)
           (body: BitWriter => Unit): Unit = {
      marker(o, 0xDA); be16(o, 6 + 2 * scanComps.size); o.write(scanComps.size)
      scanComps.foreach { ci => o.write(comps(ci)._1); o.write(0x00) }
      o.write(ss); o.write(se); o.write((ah << 4) | al)
      val bw = new BitWriter
      body(bw)
      val bytes = bw.finish()
      o.write(bytes, 0, bytes.length)
    }
    def cropBlocks(ci: Int): IndexedSeq[Array[Int]] = {
      val (_, hi, vi, blocks) = comps(ci)
      val cbw = ((w * hi + hmax - 1) / hmax + 7) / 8
      val cbh = ((h * vi + vmax - 1) / vmax + 7) / 8
      val storeBwC = mcuCols * hi
      for (by <- 0 until cbh; bx <- 0 until cbw) yield blocks(by * storeBwC + bx)
    }
    // DC restart units: MCUs when interleaved (Ns>1), crop blocks for
    // a single-component frame (where both grids coincide)
    val dcUnits: IndexedSeq[IndexedSeq[(Int, Array[Int])]] =
      if (comps.size > 1)
        for (my <- 0 until mcuRows; mx <- 0 until mcuCols) yield (for {
          ci <- comps.indices
          (_, hi, vi, blocks) = comps(ci)
          by <- 0 until vi; bx <- 0 until hi
        } yield (ci, blocks((my * vi + by) * (mcuCols * hi) + mx * hi + bx)))
      else cropBlocks(0).map(b => IndexedSeq((0, b)))
    sos(comps.indices, 0, 0, 0, 1) { bw =>
      val pred = new Array[Int](comps.size)
      val rste = new RstEmitter(bw, restartInterval)
      dcUnits.foreach { unit =>
        if (rste.atBoundary(() => ())) java.util.Arrays.fill(pred, 0)
        unit.foreach { case (ci, coef) =>
          val v = coef(0) >> 1 // DC point transform: arithmetic shift
          val diff = v - pred(ci); pred(ci) = v
          val t = category(diff)
          val (c, l) = dcEnc(t)
          bw.putBits(c, l); if (t > 0) bw.putBits(signedBits(diff, t), t)
        }
      }
    }
    for (ci <- comps.indices) {
      sos(Seq(ci), 1, 5, 0, 1)(bw =>
        emitAcFirstScan(bw, acEnc, cropBlocks(ci), 1, 5, 1, restartInterval))
      sos(Seq(ci), 6, 63, 0, 1)(bw =>
        emitAcFirstScan(bw, acEnc, cropBlocks(ci), 6, 63, 1, restartInterval))
    }
    sos(comps.indices, 0, 0, 1, 0) { bw =>
      val rste = new RstEmitter(bw, restartInterval)
      dcUnits.foreach { unit =>
        rste.atBoundary(() => ())
        unit.foreach { case (_, coef) => bw.putBits(coef(0) & 1, 1) }
      }
    }
    for (ci <- comps.indices) {
      sos(Seq(ci), 1, 63, 1, 0)(bw =>
        emitAcRefineScan(bw, acEnc, cropBlocks(ci), 1, 63, 0, restartInterval))
    }
    marker(o, 0xD9)
    o.toByteArray
  }

  /** Encode a color progressive (SOF2) JPEG — same planes, quantization
    * and subsampling as the baseline [[encode]], different scan wiring. */
  def encodeProgressive(w: Int, h: Int, rgb: (Int, Int) => Int,
                        subsample420: Boolean,
                        restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val hmax = if (subsample420) 2 else 1
    val mcuW = 8 * hmax; val mcuH = 8 * hmax
    val mcuCols = (w + mcuW - 1) / mcuW
    val mcuRows = (h + mcuH - 1) / mcuH
    val lumaW = mcuCols * mcuW; val lumaH = mcuRows * mcuH
    val yP = new Array[Int](lumaW * lumaH)
    val cbF = new Array[Int](lumaW * lumaH)
    val crF = new Array[Int](lumaW * lumaH)
    var yy = 0
    while (yy < lumaH) {
      var xx = 0
      while (xx < lumaW) {
        val px = rgb(math.min(xx, w - 1), math.min(yy, h - 1))
        val (y0, cb0, cr0) = rgbToYcc((px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)
        yP(yy * lumaW + xx) = y0; cbF(yy * lumaW + xx) = cb0; crF(yy * lumaW + xx) = cr0
        xx += 1
      }
      yy += 1
    }
    val chromaW = lumaW / hmax; val chromaH = lumaH / hmax
    def subsample(full: Array[Int]): Array[Int] =
      if (!subsample420) full
      else Array.tabulate(chromaW * chromaH) { i =>
        val cx = (i % chromaW) * 2; val cy = (i / chromaW) * 2
        (full(cy * lumaW + cx) + full(cy * lumaW + cx + 1) +
          full((cy + 1) * lumaW + cx) + full((cy + 1) * lumaW + cx + 1) + 2) / 4
      }
    writeProgressive(w, h, Seq(
      (1, hmax, hmax, planeCoefBlocks(yP, lumaW, mcuCols * hmax, mcuRows * hmax)),
      (2, 1, 1, planeCoefBlocks(subsample(cbF), chromaW, mcuCols, mcuRows)),
      (3, 1, 1, planeCoefBlocks(subsample(crF), chromaW, mcuCols, mcuRows))),
      mcuCols, mcuRows, restartInterval)
  }

  /** Encode a GRAYSCALE progressive JPEG (non-interleaved DC scan). */
  def encodeGrayProgressive(w: Int, h: Int, lum: (Int, Int) => Int,
                            restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF)
    val mcuCols = (w + 7) / 8; val mcuRows = (h + 7) / 8
    val planeW = mcuCols * 8; val planeH = mcuRows * 8
    val plane = Array.tabulate(planeW * planeH)(i =>
      clamp8(lum(math.min(i % planeW, w - 1), math.min(i / planeW, h - 1))))
    writeProgressive(w, h,
      Seq((1, 1, 1, planeCoefBlocks(plane, planeW, mcuCols, mcuRows))),
      mcuCols, mcuRows, restartInterval)
  }

  /** Number of SOS markers in the stream. Entropy-coded data never
    * contains FF followed by a non-zero, non-RST byte, so a flat byte
    * walk over FF DA pairs is exact. */
  def countScans(p: Array[Byte]): Int = {
    var n = 0; var i = 0
    while (i + 1 < p.length) {
      if ((p(i) & 0xFF) == 0xFF && (p(i + 1) & 0xFF) == 0xDA) n += 1
      i += 1
    }
    n
  }
}
