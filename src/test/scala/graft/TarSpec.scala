package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Tar

/** ustar shards: header layout + verified checksums, block padding
  * edges, WebDataset sample grouping, loud failure on corruption. */
class TarSpec extends SparkSpec {
  import spark.implicits._

  test("entry bytes: 512-byte header, octal size, valid checksum, padded content") {
    val content = "hello tar".getBytes(UTF_8)
    val e = Tar.entryBytes("1.txt", content)
    assert(e.length == 512 + 512) // header + one padded block
    assert(new String(e, 257, 5, UTF_8) == "ustar")
    assert(java.lang.Long.parseLong(
      new String(e, 124, 11, UTF_8).trim, 8) == content.length)
    // exact multiple of 512: content occupies whole blocks, no pad
    val full = Tar.entryBytes("2.txt", new Array[Byte](1024))
    assert(full.length == 512 + 1024)
    // round trip through the verifying walker
    val both = e ++ full ++ new Array[Byte](1024)
    val parsed = Tar.parseEntries(both).toSeq
    assert(parsed.map(_.name) == Seq("1.txt", "2.txt"))
    assert(parsed.head.content.toSeq == content.toSeq)
    assert(parsed(1).content.length == 1024)
  }

  test("corrupted header checksum / magic / truncation fail loudly") {
    val good = Tar.entryBytes("a.txt", "x".getBytes(UTF_8)) ++ new Array[Byte](1024)
    val badSum = good.clone(); badSum(0) = 'z' // name change breaks the sum
    intercept[IllegalArgumentException] { Tar.parseEntries(badSum).toSeq }
    val badMagic = good.clone(); badMagic(257) = 'x'
    intercept[IllegalArgumentException] { Tar.parseEntries(badMagic).toSeq }
    intercept[IllegalArgumentException] {
      // size field says more bytes than the file has
      Tar.parseEntries(Tar.entryBytes("b.txt", new Array[Byte](600)).take(700)).toSeq
    }
  }

  test("round trip: WebDataset pairs re-grouped, pad-edge ids byte-exact") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Tar.roundTrip(spark, docs, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang", "source", "n_bytes")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got.size == docs.count())
    val want = docs.select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().toSeq.sortBy(_._1)
    for (((id, text, lang, source, nBytes), (wid, wtext, wlang, wsource)) <- got.zip(want)) {
      assert(id == wid && lang == wlang && source == wsource)
      if (id % 17 == 0) {
        // planted pad: byte length an exact 512 multiple, text prefix intact
        assert(nBytes % 512 == 0 && nBytes > 0, s"id $id nBytes $nBytes")
        assert(text.startsWith(wtext) && text.drop(wtext.length).forall(_ == ' '))
      } else {
        assert(text == wtext)
        assert(nBytes == wtext.getBytes(UTF_8).length.toLong)
      }
    }
  }
}
