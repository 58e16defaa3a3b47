package graft

import graft.ext.Mp4

/** ISO-BMFF walker: box nesting, header field extraction, sample-table
  * offset arithmetic, corrupt-byte degradation. */
class Mp4Spec extends SparkSpec {

  test("round trip: headers and the sample table recover the planted values") {
    val samples = IndexedSeq(
      Array.tabulate(9)(j => (j * 3 + 1).toByte),
      Array.tabulate(4)(j => (j + 100).toByte),
      Array.tabulate(7)(j => (250 - j).toByte))
    val p = Mp4.encode(640, 480, 1000L, 1200L, samples)
    val m = Mp4.parse(p).get
    assert(m.timescale == 1000L && m.durationTs == 1200L)
    assert(m.width == 640 && m.height == 480)
    assert(m.sampleSizes.toSeq == Seq(9L, 4L, 7L))
    // extracted via stco + cumsum: the actual planted bytes, in order
    val extracted = m.sampleOffsets.zip(m.sampleSizes).map { case (o, len) =>
      p.slice(o.toInt, (o + len).toInt).toSeq
    }
    assert(extracted.toSeq == samples.map(_.toSeq))
    // offsets live inside mdat
    assert(m.sampleOffsets.head >= m.mdatStart)
    assert(m.sampleOffsets.last + m.sampleSizes.last <= m.mdatStart + m.mdatSize)
  }

  test("uniform-size stsz branch parses identically") {
    val samples = IndexedSeq.fill(5)(Array.tabulate(6)(j => (j * 7).toByte))
    val p = Mp4.encode(64, 48, 1000L, 200L, samples)
    // locate the stsz payload (version byte) and patch the uniform field
    var stszAt = -1
    for (i <- 0 until p.length - 4)
      if (p(i) == 's' && p(i + 1) == 't' && p(i + 2) == 's' && p(i + 3) == 'z') stszAt = i + 4
    assert(stszAt > 0)
    val patched = p.clone()
    patched(stszAt + 4 + 3) = 6 // sample_size = 6 (uniform)
    val a = Mp4.parse(p).get; val b = Mp4.parse(patched).get
    assert(a.sampleSizes.toSeq == b.sampleSizes.toSeq)
    assert(a.sampleOffsets.toSeq == b.sampleOffsets.toSeq)
  }

  test("corrupt bytes degrade to None / sentinels, never exceptions") {
    val good = Mp4.syntheticMp4(3L)
    assert(Mp4.parse(good).isDefined)
    assert(Mp4.parse(good.take(40)).isEmpty) // truncated inside moov
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    val noFtyp = good.clone(); noFtyp(4) = 'x'
    assert(Mp4.parse(noFtyp).isEmpty)
    // box length running past the buffer
    val badLen = good.clone(); badLen(0) = 0x7F
    assert(Mp4.parse(badLen).isEmpty)
    assert(Mp4.features(3L, good.take(40)).checksum == -1L)
  }

  test("features match the closed form the oracle computes") {
    for (id <- Seq(0L, 1L, 6L, 13L)) {
      val f = Mp4.features(id, Mp4.syntheticMp4(id))
      val (n, len) = (Mp4.fxSamples(id), Mp4.fxSampleLen(id))
      assert(f.duration_ms == Mp4.fxDurationMs(id))
      assert(f.width == Mp4.fxWidth(id) && f.height == Mp4.fxHeight(id))
      assert(f.n_samples == n && f.sample_bytes == n.toLong * len)
      val want = (for (i <- 0 until n; j <- 0 until len)
        yield (Mp4.fxByte(id, i, j) + 1L) * (i * len + j + 1)).sum
      assert(f.checksum == want)
    }
  }
}
