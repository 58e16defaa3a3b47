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

  test("multi-chunk stsc walk: layout-invariant features, gaps never read") {
    // id 6: 8 samples in chunks (1,2,2,2,1) with planted 0xEE.. garbage
    // between chunks; id 7: same construction single-chunk. Features
    // must be identical functions of the SAMPLES, whatever the layout.
    val samples = IndexedSeq.tabulate(8)(i =>
      Array.tabulate(6)(j => ((i * 7 + j) % 256).toByte))
    val single = Mp4.encode(64, 48, 1000L, 800L, samples)
    val multi = Mp4.encode(64, 48, 1000L, 800L, samples, Seq(1, 2, 2, 2, 1))
    assert(multi.length > single.length) // the gaps are really in there
    val fs = Mp4.features(1L, single)
    val fm = Mp4.features(1L, multi)
    assert(fm == fs.copy(media_id = 1L),
      "multi-chunk decode diverged from single-chunk on identical samples")
    // a garbage gap byte never contributes: flipping a gap byte must not
    // move the checksum (flipping a SAMPLE byte must)
    val gapAt = multi.length - 1 - multi.reverse.indexOf(0xBB.toByte)
    val flippedGap = multi.clone(); flippedGap(gapAt) = 0x11
    assert(Mp4.features(1L, flippedGap) == fm)
    val m = Mp4.parse(multi).get
    val flippedSample = multi.clone()
    flippedSample(m.sampleOffsets(3).toInt) =
      (flippedSample(m.sampleOffsets(3).toInt) ^ 0x40).toByte
    assert(Mp4.features(1L, flippedSample).checksum != fm.checksum)
    // the run-length stsc really selected varying chunk sizes: sample 0
    // alone in chunk 0, samples 1-2 contiguous, but 0 and 1 are NOT
    // (the gap sits between them)
    assert(m.sampleOffsets(2) == m.sampleOffsets(1) + 6)
    assert(m.sampleOffsets(1) > m.sampleOffsets(0) + 6)
    // the graded fixture family really exercises both layouts
    assert(Mp4.fxChunks(6L).length > 1 && Mp4.fxChunks(7L).length == 1)
    assert(Mp4.fxChunks(6L).sum == Mp4.fxSamples(6L))
  }

  test("mjpeg frames: per-frame means match the integer YCbCr round trip") {
    // 3 is the gray id, 1 exercises 4:2:0, 0/6 4:4:4 (6 multi-chunk)
    for (id <- Seq(0L, 1L, 3L, 6L)) {
      val frames = Mp4.mjpegFrames(id, Mp4.syntheticMjpegMp4(id))
      assert(frames.length == Mp4.fxFrameCount(id))
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_no == i.toLong && f.width > 0 && f.height > 0)
        val r = Mp4.fxFrameR(id, i)
        if (Mp4.fxMjpegGray(id))
          assert((f.mean_r, f.mean_g, f.mean_b) == ((r.toLong, r.toLong, r.toLong)))
        else {
          val (g, b) = (Mp4.fxFrameG(id, i), Mp4.fxFrameB(id, i))
          val (y, cb, cr) = graft.ext.Jpeg.rgbToYcc(r, g, b)
          val want = graft.ext.Jpeg.yccToRgb(y, cb, cr)
          assert((f.mean_r, f.mean_g, f.mean_b) ==
            ((want._1.toLong, want._2.toLong, want._3.toLong)))
        }
      }
    }
  }

  test("mjpeg frames: a corrupt sample degrades alone, siblings still decode") {
    val id = 4L // 4 frames, single chunk, color
    val good = Mp4.syntheticMjpegMp4(id)
    val m = Mp4.parse(good).get
    val bad = good.clone()
    // destroy frame 1's SOI marker: that sample can no longer decode
    bad(m.sampleOffsets(1).toInt) = 0x00
    val frames = Mp4.mjpegFrames(id, bad)
    assert(frames.length == Mp4.fxFrameCount(id))
    assert(frames(1).mean_r == -1L && frames(1).width == -1L)
    val goodFrames = Mp4.mjpegFrames(id, good)
    assert(frames.zipWithIndex.filter(_._2 != 1).map(_._1) ===
      goodFrames.zipWithIndex.filter(_._2 != 1).map(_._1))
    // corrupt CONTAINER -> one sentinel row, never a throw
    assert(Mp4.mjpegFrames(id, good.take(30)) ===
      Seq(Mp4.MjpegFrame(id, -1L, -1L, -1L, -1L, -1L, -1L)))
  }

  test("mjpeg frames: multi-chunk layout decodes the same frames as single-chunk") {
    // id 6 is multi-chunk; rebuild the same samples single-chunk and
    // require identical frame rows — the gap bytes never reach the
    // JPEG decoder
    val id = 6L
    val n = Mp4.fxFrameCount(id)
    val w = graft.ext.Multimodal.fxW(id); val h = graft.ext.Multimodal.fxH(id)
    val samples = IndexedSeq.tabulate(n) { i =>
      val px = (Mp4.fxFrameR(id, i) << 16) | (Mp4.fxFrameG(id, i) << 8) | Mp4.fxFrameB(id, i)
      graft.ext.Jpeg.encode(w, h, (_, _) => px, Mp4.fxMjpeg420(id), 0)
    }
    val single = Mp4.encode(w, h, 1000L, n.toLong * 40L, samples, Seq(n))
    assert(Mp4.mjpegFrames(id, Mp4.syntheticMjpegMp4(id)) ===
      Mp4.mjpegFrames(id, single))
  }
}
