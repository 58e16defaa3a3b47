package graft

import graft.ext.Gif

/** GIF codec: LZW round trips across width growth, dictionary resets,
  * KwKwK and flush boundaries; interlace; corrupt-byte degradation. */
class GifSpec extends SparkSpec {

  private def lcg(n: Int, seed: Long): Array[Int] = {
    var s = seed
    Array.fill(n) { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 33) & 0xFF).toInt }
  }

  private def roundTrip(ind: Array[Int]): Unit = {
    val got = Gif.lzwDecode(8, Gif.lzwEncode(8, ind), ind.length)
    assert(got.isDefined, s"decode failed for n=${ind.length}")
    assert(got.get.toSeq == ind.toSeq, s"mismatch at n=${ind.length}")
  }

  test("LZW round trip: constant runs (KwKwK), alternating, single pixel") {
    roundTrip(Array(7))
    roundTrip(Array.fill(500)(42)) // immediate KwKwK chains
    roundTrip(Array.tabulate(999)(i => i % 2))
  }

  test("LZW round trip across every small flush boundary and width bump") {
    // the first width bump (9->10) happens after 255 dictionary adds;
    // sweeping lengths crosses the flush-on-boundary edge the encoder
    // mirrors explicitly
    (1 to 48).foreach(n => roundTrip(lcg(n, n)))
    (250 to 266).foreach(n => roundTrip(lcg(n, 1)))
    (500 to 530 by 3).foreach(n => roundTrip(lcg(n, 2)))
  }

  test("LZW round trip through 12-bit growth AND dictionary reset") {
    // 30k near-random symbols emit far more than 4096-258 phrases, so
    // the encoder must clear and rebuild at least once
    roundTrip(lcg(30000, 99))
    // and a compressible-but-long input (structured pattern)
    roundTrip(Array.tabulate(20000)(i => (3 * (i % 200) + 7 * (i / 200)) % 256))
  }

  test("interlaced image decodes to the same raster as the progressive one") {
    val pal = Gif.FixturePalette
    def img(il: Boolean) = Gif.encode(23, 17, il, pal, (x, y) => (5 * x + 11 * y) % 256)
    val a = Gif.decode(img(false)).get
    val b = Gif.decode(img(true)).get
    assert(!a.interlaced && b.interlaced)
    assert(a.indices.toSeq == b.indices.toSeq)
    // interlace row order is a permutation of all rows, for odd and even h
    assert(Gif.interlaceRows(17).sorted.toSeq == (0 until 17).toSeq)
    assert(Gif.interlaceRows(16).sorted.toSeq == (0 until 16).toSeq)
  }

  test("a local color table overrides the global one (hand-spliced stream)") {
    // encode normally, then splice a 4-entry LCT into the image
    // descriptor: same indices must now resolve through the local table
    val pal = Gif.FixturePalette
    val base = Gif.encode(6, 4, interlaced = false, pal, (x, y) => (x + y) % 4)
    // descriptor = 0x2C + left/top zeros (a raw indexOf(0x2C) could land
    // inside the color table)
    val imgAt = base.indexOfSlice(Seq(0x2C, 0, 0, 0, 0).map(_.toByte))
    assert(imgAt > 0)
    val lct = Array.tabulate(4)(i => Array((10 * i).toByte, (20 * i).toByte, (30 * i).toByte)).flatten
    val withLct = base.take(imgAt + 9) ++
      Array[Byte]((0x80 | 0x01).toByte) ++ // LCT flag, size 2^2 = 4 entries
      lct ++ base.drop(imgAt + 10)
    val d = Gif.decode(withLct).get
    assert(d.palette.length == 4)
    assert(d.palette(1) == ((10 << 16) | (20 << 8) | 30))
    // indices unchanged, colors resolved locally
    val plain = Gif.decode(base).get
    assert(d.indices.toSeq == plain.indices.toSeq)
  }

  test("corrupt bytes degrade to None / sentinel rows, never exceptions") {
    val good = Gif.syntheticGif(5L)
    assert(Gif.decode(good).isDefined)
    assert(Gif.decode("NOTGIF".getBytes ++ good.drop(6)).isEmpty)
    assert(Gif.decode(good.take(20)).isEmpty)
    assert(Gif.decode(Array.emptyByteArray).isEmpty)
    // truncated mid-LZW: framing intact but the stream can't finish
    assert(Gif.decode(good.dropRight(40) ++ Array[Byte](0, 0x3B)).isEmpty)
    val f = Gif.decodeFeatures(5L, good.take(20))
    assert(f.width == -1L && f.checksum == -1L)
  }

  test("decoded features match the closed form the oracle computes") {
    for (id <- Seq(0L, 1L, 7L, 13L)) {
      val f = Gif.decodeFeatures(id, Gif.syntheticGif(id))
      val (w, h) = (Gif.fxW(id), Gif.fxH(id))
      val idxs = for (y <- 0 until h; x <- 0 until w) yield Gif.fxIdx(id, x, y)
      assert(f.width == w && f.height == h && f.interlaced == Gif.fxInterlaced(id))
      assert(f.n_colors == idxs.distinct.size)
      assert(f.checksum == idxs.zipWithIndex.map { case (v, i) => (v + 1).toLong * (i + 1) }.sum)
      assert(f.mean_r == idxs.map(_.toLong).sum / (w * h))
      assert(f.mean_g == idxs.map(v => (v * 7 % 256).toLong).sum / (w * h))
      assert(f.mean_b == idxs.map(v => (v * 13 % 256).toLong).sum / (w * h))
    }
  }

  test("animation: every frame decoded, delays and loop count parsed, first-frame view intact") {
    for (id <- Seq(2L, 5L, 11L)) {
      val bytes = Gif.syntheticGifAnim(id)
      val a = Gif.decodeAnimation(bytes).get
      assert(a.frames.length == Gif.fxAnimFrames(id), s"id=$id")
      assert(a.loops == Gif.fxAnimLoops(id), s"id=$id")
      assert(a.frames.zipWithIndex.forall { case (fr, f) =>
        fr.delayCs == Gif.fxAnimDelay(id, f)
      }, s"id=$id")
      // frames decode independently to their own pixel formulas — the
      // interlace alternates per frame and must not bleed across
      for ((fr, f) <- a.frames.zipWithIndex; probe <- Seq((0, 0), (3, 2))) {
        val (x, y) = probe
        assert(fr.indices(y * fr.width + x) == Gif.fxAnimIdx(id, f, x, y),
          s"id=$id frame=$f at $probe")
      }
      // decode() (the still-image contract) sees exactly frame 0
      val still = Gif.decode(bytes).get
      assert(still.indices.sameElements(a.frames.head.indices))
    }
    // a single-image GIF (no GCE delay, no NETSCAPE): 1 frame, loops -1
    val single = Gif.decodeAnimation(Gif.syntheticGif(4L)).get
    assert(single.frames.length == 1 && single.loops == -1)
    assert(single.frames.head.delayCs == 0)
  }

  test("compositing: transparency draws through, disposal 2 restores, 3 snapshots") {
    // hand-built 4x3 screen, bg=5: frame0 full (all 1s, keep); frame1 a
    // 2x2 rect at (1,1) of [2, T, T, 3] with transparent T=9 and
    // disposal 3 (restore-previous); frame2 a 1x1 rect at (0,0) of [4]
    // with disposal 2 (restore-background)
    val pal = Gif.FixturePalette
    val bytes = Gif.encodeComposite(4, 3, 5, pal, 0, Seq(
      Gif.FrameSpec(0, 0, 4, 3, 1, 1, -1, (_, _) => 1),
      Gif.FrameSpec(1, 1, 2, 2, 2, 3, 9,
        (x, y) => Seq(Seq(2, 9), Seq(9, 3))(y)(x)),
      Gif.FrameSpec(0, 0, 1, 1, 3, 2, -1, (_, _) => 4)))
    val a = Gif.decodeAnimation(bytes).get
    assert((a.screenW, a.screenH, a.bgIndex) == ((4, 3, 5)))
    assert(a.frames.map(_.disposal) == Seq(1, 3, 2))
    assert(a.frames.map(_.transIdx) == Seq(-1, 9, -1))
    assert(a.frames.map(f => (f.left, f.top)) == Seq((0, 0), (1, 1), (0, 0)))
    // replay canvases by hand
    def ck(f: Int, canvas: Seq[Int]): Long =
      canvas.zipWithIndex.map { case (v, i) => (v + 1).toLong * (f * 12 + i + 1) }.sum
    val c0 = Seq.fill(12)(1)
    // frame1 draws 2 at (1,1) and 3 at (2,2); T pixels show frame0's 1s
    val c1 = Seq(1, 1, 1, 1,  1, 2, 1, 1,  1, 1, 3, 1)
    // disposal 3 restored c0 before frame2; frame2 draws 4 at (0,0)
    val c2 = Seq(4, 1, 1, 1,  1, 1, 1, 1,  1, 1, 1, 1)
    assert(Gif.compositedChecksums(a) ==
      Seq(ck(0, c0), ck(1, c1), ck(2, c2)))
    // the graded fixture family really exercises all three behaviors
    val specs = Gif.fxCompSpecs(8L)
    assert(specs.map(_.disposal) == Seq(1, 2, 1))
    assert(specs.map(_.transIdx) == Seq(-1, 7, -1))
  }
}
