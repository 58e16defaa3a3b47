package graft

import graft.ext.Jpeg

/** Progressive (SOF2) JPEG: the multi-scan coefficient accumulation must
  * land on exactly the pixels the single-scan baseline path produces —
  * both decode the same quantized coefficients losslessly under the
  * all-ones fixture tables, so equality is bit-for-bit, not a PSNR
  * band. */
class JpegProgressiveSpec extends SparkSpec {

  private def gradient(seed: Int)(x: Int, y: Int): Int = {
    val r = (x * 7 + y * 3 + seed) % 256
    val g = (x * 2 + y * 11 + seed * 5) % 256
    val b = (x * 13 + y + seed * 9) % 256
    (r << 16) | (g << 8) | b
  }

  test("gray progressive == gray baseline, pixel for pixel (odd sizes)") {
    for ((w, h) <- Seq((8, 8), (17, 9), (21, 13), (40, 33))) {
      def lum(x: Int, y: Int): Int = (x * 5 + y * 7 + 31) % 256
      val base = Jpeg.decode(Jpeg.encodeGray(w, h, lum)).get
      val prog = Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, lum)).get
      assert(prog.width == w && prog.height == h && prog.chroma == "gray")
      assert(prog.rgb.toSeq == base.rgb.toSeq, s"gray $w x $h diverged")
    }
  }

  test("color 4:4:4 progressive == baseline, pixel for pixel") {
    for ((w, h, seed) <- Seq((16, 16, 1), (19, 11, 2), (33, 27, 3))) {
      val base = Jpeg.decode(Jpeg.encode(w, h, gradient(seed), subsample420 = false)).get
      val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, gradient(seed), subsample420 = false)).get
      assert(prog.chroma == "444")
      assert(prog.rgb.toSeq == base.rgb.toSeq, s"444 $w x $h diverged")
    }
  }

  test("color 4:2:0 progressive == baseline — the crop-vs-store block-grid trap") {
    // w,h NOT multiples of 16: the luma store grid (MCU-padded) is
    // strictly larger than the non-interleaved scan's crop grid
    for ((w, h, seed) <- Seq((20, 20, 4), (17, 23, 5), (48, 32, 6))) {
      val base = Jpeg.decode(Jpeg.encode(w, h, gradient(seed), subsample420 = true)).get
      val prog = Jpeg.decode(Jpeg.encodeProgressive(w, h, gradient(seed), subsample420 = true)).get
      assert(prog.chroma == "420")
      assert(prog.rgb.toSeq == base.rgb.toSeq, s"420 $w x $h diverged")
    }
  }

  test("constant image: EOBn run batching across many all-zero-band blocks, exact decode") {
    // 64x64 gray: 64 blocks, every AC band empty -> the whole scan is one
    // batched EOB run (EOBn with r up to 6), and DC-only blocks decode
    // exactly to the constant
    val prog = Jpeg.decode(Jpeg.encodeGrayProgressive(64, 64, (_, _) => 77)).get
    assert(prog.rgb.forall(_ == ((77 << 16) | (77 << 8) | 77)))
    // color constant through the fixed-point YCbCr round trip == baseline
    val basec = Jpeg.decode(Jpeg.encode(32, 32, (_, _) => 0x5A8C3D, subsample420 = false)).get
    val progc = Jpeg.decode(Jpeg.encodeProgressive(32, 32, (_, _) => 0x5A8C3D, subsample420 = false)).get
    assert(progc.rgb.toSeq == basec.rgb.toSeq)
  }

  test("scan script shape: 5 scans gray, 11 color; baseline has 1") {
    // gray: DC first + 2 AC bands + DC refine + AC refine = 5
    // color: DC first + 3x2 AC bands + DC refine + 3 AC refines = 11
    assert(Jpeg.countScans(Jpeg.encodeGrayProgressive(10, 10, (x, y) => x + y)) == 5)
    assert(Jpeg.countScans(Jpeg.encodeProgressive(10, 10, gradient(7), subsample420 = false)) == 11)
    assert(Jpeg.countScans(Jpeg.encode(10, 10, gradient(7), subsample420 = false)) == 1)
  }

  test("restart intervals in progressive scans: RSTn every Ri units in EVERY scan") {
    // pixels must be identical with and without restarts, for both the
    // interleaved DC scan (MCU units) and non-interleaved AC scans
    // (crop-block units), gray and color, odd sizes
    for ((w, h, seed, ri) <- Seq((17, 9, 1, 2), (20, 20, 2, 1), (33, 27, 3, 3))) {
      val plain = Jpeg.decode(Jpeg.encodeProgressive(w, h, gradient(seed), subsample420 = true)).get
      val rst = Jpeg.decode(Jpeg.encodeProgressive(w, h, gradient(seed), subsample420 = true, ri)).get
      assert(rst.rgb.toSeq == plain.rgb.toSeq, s"420+DRI $w x $h ri=$ri diverged")
      val gp = Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, (x, y) => (x * 3 + y * 5 + seed) % 256)).get
      val gr = Jpeg.decode(Jpeg.encodeGrayProgressive(w, h, (x, y) => (x * 3 + y * 5 + seed) % 256, ri)).get
      assert(gr.rgb.toSeq == gp.rgb.toSeq, s"gray+DRI $w x $h ri=$ri diverged")
    }
    // the DRI stream genuinely contains restart markers
    val s = Jpeg.encodeGrayProgressive(40, 33, (x, y) => x + y, 2)
    val nRst = s.sliding(2).count(p => (p(0) & 0xFF) == 0xFF &&
      (p(1) & 0xFF) >= 0xD0 && (p(1) & 0xFF) <= 0xD7)
    assert(nRst > 5, s"expected many RSTn markers, found $nRst")
  }

  test("corrupt progressive bytes degrade to None, never exceptions") {
    val good = Jpeg.encodeProgressive(24, 18, gradient(8), subsample420 = true)
    assert(Jpeg.decode(good).isDefined)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty) // truncated mid-scan
    assert(Jpeg.decode(good.take(40)).isEmpty) // truncated in headers
    // flip a byte inside the first scan's entropy data: either a caught
    // decode failure (None) or a decode to different pixels — never a throw
    val sosAt = good.indexOfSlice(Seq(0xFF.toByte, 0xDA.toByte))
    val bad = good.clone(); bad(sosAt + 20) = (bad(sosAt + 20) ^ 0x55).toByte
    Jpeg.decode(bad) // must not throw
  }
}
