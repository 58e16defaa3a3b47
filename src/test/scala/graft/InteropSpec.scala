package graft

import java.io.ByteArrayInputStream

import graft.ext.{Gif, Multimodal}

/** THIRD-PARTY codec interop: the JDK's own decoders (ImageIO,
  * javax.sound) must read our fixture bytes to exactly the closed-form
  * ground truth the DuckDB oracle grades — independent evidence that
  * the fixtures are REAL format members, not artifacts only our own
  * walkers can round-trip. (The tar sibling lives in TarSpec via
  * commons-compress; warc.gz via GZIPInputStream in WarcSpec.) */
class InteropSpec extends SparkSpec {

  test("ImageIO decodes our PNGs (all color types, incl. Adam7) to the pixel formula") {
    for (id <- 0L until 22L) { // covers gray/rgb/rgba × plain/interlaced (id%7==3)
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Multimodal.syntheticPng(id)))
      assert(img != null, s"id=$id: ImageIO rejected the PNG")
      val (w, h) = (Multimodal.fxPngW(id), Multimodal.fxPngH(id))
      assert(img.getWidth == w && img.getHeight == h, s"id=$id dims")
      val ct = Multimodal.fxPngColorType(id)
      // raw raster samples: getRGB would color-convert gray through
      // sRGB; the wire samples are what the format stores
      val raster = img.getRaster
      val bands = ct match { case 0 => 1; case 2 => 3; case _ => 4 }
      assert(raster.getNumBands == bands, s"id=$id bands")
      for (y <- 0 until h; x <- 0 until w; c <- 0 until bands) {
        assert(raster.getSample(x, y, c) == Multimodal.fxPngVal(id, c, x, y),
          s"id=$id ($x,$y) band $c")
      }
    }
  }

  test("ImageIO decodes our GIFs (incl. interlaced) to the palette formula") {
    for (id <- Seq(0L, 1L, 6L, 11L)) { // both interlace phases
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Gif.syntheticGif(id)))
      assert(img != null, s"id=$id: ImageIO rejected the GIF")
      val (w, h) = (Gif.fxW(id), Gif.fxH(id))
      assert(img.getWidth == w && img.getHeight == h, s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y) & 0xFFFFFF
        val want = Gif.FixturePalette(Gif.fxIdx(id, x, y))
        assert(rgb == want, s"id=$id ($x,$y): got $rgb want $want")
      }
    }
  }

  test("ImageIO decodes our BMPs to the constant fill, padding ignored") {
    for (id <- Seq(0L, 3L, 9L)) { // BMP ids are % 3 == 0 in the mixed family
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(
        Multimodal.encodeBmp(Multimodal.fxW(id), Multimodal.fxH(id),
          Multimodal.fxR(id), Multimodal.fxG(id), Multimodal.fxB(id))))
      assert(img != null, s"id=$id: ImageIO rejected the BMP")
      assert(img.getWidth == Multimodal.fxW(id) && img.getHeight == Multimodal.fxH(id))
      val want = (Multimodal.fxR(id) << 16) | (Multimodal.fxG(id) << 8) |
        Multimodal.fxB(id)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert((img.getRGB(x, y) & 0xFFFFFF) == want, s"id=$id ($x,$y)")
    }
  }

  test("ImageIO decodes our baseline JPEGs within IDCT tolerance of our decoder") {
    // JPEG decode is not bit-exact across decoders (IDCT rounding,
    // chroma upsampling filters differ) — but two correct decoders of
    // the SAME file must agree within a few counts per channel
    for (id <- Seq(0L, 1L, 3L, 5L, 7L)) { // gray/444/420 × DRI variants
      val bytes = Multimodal.syntheticJpegScan(id)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"id=$id: ImageIO rejected the JPEG")
      val ours = graft.ext.Jpeg.decode(bytes).get
      assert(img.getWidth == ours.width && img.getHeight == ours.height, s"id=$id dims")
      // raw raster samples (getRGB color-converts gray through sRGB):
      // 1-band gray compares against our red; 3-band against all three
      val raster = img.getRaster
      var worst = 0
      for (y <- 0 until ours.height; x <- 0 until ours.width) {
        val b = ours.rgb(y * ours.width + x)
        val shifts = if (raster.getNumBands == 1) Seq(16) else Seq(16, 8, 0)
        shifts.zipWithIndex.foreach { case (shift, band) =>
          val d = math.abs(raster.getSample(x, y, band) - ((b >> shift) & 0xFF))
          if (d > worst) worst = d
        }
      }
      assert(worst <= 8, s"id=$id: decoders diverge by $worst counts")
    }
  }

  test("javax.sound reads our WAVs: format header and frame count per bit depth") {
    for (id <- Seq(0L, 1L, 2L, 7L, 11L)) { // all three depths
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(Multimodal.syntheticWav(id)))
      val f = in.getFormat
      assert(f.getSampleRate.toInt == Multimodal.fxSampleRate(id), s"id=$id rate")
      assert(f.getChannels == Multimodal.fxChannels(id), s"id=$id channels")
      assert(f.getSampleSizeInBits == Multimodal.fxBits(id), s"id=$id bits")
      assert(in.getFrameLength == Multimodal.fxFrames(id).toLong, s"id=$id frames")
      // decode the first frame (javax.sound reads whole frames only)
      // and check channel 0's amplitude
      val bps = Multimodal.fxBits(id) / 8
      val buf = new Array[Byte](bps * Multimodal.fxChannels(id))
      assert(in.read(buf) == buf.length)
      val v = Multimodal.fxBits(id) match {
        case 8  => (buf(0) & 0xFF) - 128
        case 16 => ((buf(0) & 0xFF) | (buf(1) << 8)).toShort.toInt
        case _  => ((buf(0) & 0xFF) | ((buf(1) & 0xFF) << 8) | (buf(2) << 16))
      }
      assert(v == Multimodal.fxStoredAmp(id), s"id=$id amplitude")
      in.close()
    }
  }
}
