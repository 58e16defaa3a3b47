package graft

import graft.ext.{Exif, Jpeg, Multimodal}

/** EXIF/APP1: TIFF IFD round trip in both byte orders, inline vs
  * spilled values, graceful degradation on corrupt IFDs, and
  * non-interference with the pixel decode. */
class ExifSpec extends SparkSpec {

  private val entries = Seq(
    Exif.Entry(0x0100, Exif.Longs(Seq(640L))),
    Exif.Entry(0x010F, Exif.Ascii("graft")),
    Exif.Entry(0x0112, Exif.Shorts(Seq(6))),
    Exif.Entry(0x011A, Exif.Rational(72, 1)),
    Exif.Entry(0x0132, Exif.Ascii("2026:01:01 00:00:07")))

  private def tagsOf(le: Boolean): (String, Seq[Exif.ExifTag]) =
    Exif.parseTiff(Exif.tiffBytes(le, entries)).get

  test("IFD round trip, both byte orders, inline and spilled values") {
    for ((le, bo) <- Seq((true, "II"), (false, "MM"))) {
      val (order, tags) = tagsOf(le)
      assert(order == bo)
      assert(tags.map(t => (t.tag, t.ttype, t.n_values, t.value)) == Seq(
        (0x0100, 4, 1L, "640"),        // inline LONG
        (0x010F, 2, 6L, "graft"),      // spilled ASCII (5 + NUL)
        (0x0112, 3, 1L, "6"),          // inline SHORT
        (0x011A, 5, 1L, "72/1"),       // spilled RATIONAL
        (0x0132, 2, 20L, "2026:01:01 00:00:07"))) // spilled ASCII
    }
  }

  test("multi-value and short-inline-ascii shapes") {
    val t = Exif.parseTiff(Exif.tiffBytes(littleEndian = true, Seq(
      Exif.Entry(0x0115, Exif.Shorts(Seq(1, 2))),   // 4 bytes: exactly inline
      Exif.Entry(0x0131, Exif.Ascii("abc")),        // 4 bytes with NUL: inline
      Exif.Entry(0x0117, Exif.Longs(Seq(10L, 20L, 30L)))))).get._2 // spilled
    // ascending-tag order: 0x0115 StripByteCounts, 0x0117, 0x0131 Software
    assert(t.map(_.value) == Seq("1,2", "10,20,30", "abc"))
  }

  test("corrupt IFDs degrade to None; unknown types skip the entry only") {
    val good = Exif.tiffBytes(littleEndian = true, entries)
    // bad magic
    val badMagic = good.clone(); badMagic(2) = 99
    assert(Exif.parseTiff(badMagic).isEmpty)
    // IFD offset past the block
    val badIfd = good.clone(); badIfd(4) = 0xF0.toByte
    assert(Exif.parseTiff(badIfd).isEmpty)
    // truncated mid-IFD
    assert(Exif.parseTiff(good.take(8 + 2 + 12 * 2)).isEmpty)
    // a spilled value offset beyond the block: patch Make's offset field
    val badOff = good.clone()
    // entry 1 (0x010F) starts at 8 + 2 + 12; its offset field is +8
    val offAt = 8 + 2 + 12 + 8
    badOff(offAt) = 0xFF.toByte; badOff(offAt + 1) = 0x7F.toByte
    assert(Exif.parseTiff(badOff).isEmpty)
    // unknown TYPE on one entry: that entry skipped, the rest kept
    val unk = good.clone()
    val typeAt = 8 + 2 + 2 // entry 0's type field
    unk(typeAt) = 99.toByte; unk(typeAt + 1) = 0
    val kept = Exif.parseTiff(unk).get._2
    assert(kept.length == entries.length - 1 && !kept.exists(_.tag == 0x0100))
  }

  test("APP1 planting: segment walk finds it; pixel decode is unaffected") {
    val id = 7L
    val plain = Multimodal.syntheticJpegScan(id)
    val withExif = Exif.syntheticJpegWithExif(id)
    assert(Exif.parseExif(plain).isEmpty) // no APP1 in the plain fixture
    val (bo, tags) = Exif.parseExif(withExif).get
    // id 7 is odd → Motorola; 6 IFD0 tags + 4 sub-IFD tags (the 0x8769
    // pointer is structural — it is followed, never emitted as a row)
    assert(bo == "MM" && tags.length == 10)
    assert(tags.count(_.ifd == "ifd0") == 6 && tags.count(_.ifd == "exif") == 4)
    assert(!tags.exists(_.tag == Exif.ExifIfdPointer))
    assert(tags.find(_.tag == 0x8827).get.value == "450") // ISO, in the sub-IFD
    assert(tags.find(_.tag == 0x829A).get.value == "1/8") // ExposureTime
    // the decoder must still decode pixels identically around the APP1
    val a = Jpeg.decode(plain).get; val b = Jpeg.decode(withExif).get
    assert(a.width == b.width && a.height == b.height && a.rgb.toSeq == b.rgb.toSeq)
    // truncating inside the APP1 payload degrades to None, no throw
    assert(Exif.parseExif(withExif.take(20)).isEmpty)
  }
}
