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

  test("pax extended headers: path override applies, records self-frame, globals skip") {
    // the self-referential length fixpoint: record length includes its
    // own digits ("20 path=/x/y.txt\n" is 17+len-digits bytes)
    val rec = Tar.paxRecord("path", "/x/y.txt")
    val s = new String(rec, UTF_8)
    assert(s.endsWith("\n") && s.split(" ", 2)(0).toInt == rec.length)
    assert(Tar.parsePaxRecords(rec) == Seq("path" -> "/x/y.txt"))
    // a 'x' entry renames ONLY the next entry; the decoy ustar name dies
    val longPath = "deep/" + ("d" * 120) + "/42.txt"
    val tar = Tar.paxEntryBytes(Seq("path" -> longPath, "mtime" -> "0")) ++
      Tar.entryBytes("42.tmp", "hello".getBytes(UTF_8)) ++
      Tar.entryBytes("43.txt", "world".getBytes(UTF_8)) ++
      new Array[Byte](1024)
    val es = Tar.parseEntries(tar).toSeq
    assert(es.map(_.name) == Seq(longPath, "43.txt"))
    assert(es.map(e => new String(e.content, UTF_8)) == Seq("hello", "world"))
    // a GLOBAL pax header ('g') parses for well-formedness and skips
    val g = Tar.entryBytes("pax_global", Tar.paxRecord("comment", "x"), 'g') ++
      Tar.entryBytes("7.txt", "z".getBytes(UTF_8)) ++ new Array[Byte](1024)
    assert(Tar.parseEntries(g).toSeq.map(_.name) == Seq("7.txt"))
    // directories skip; unknown typeflags are LOUD
    val d = Tar.entryBytes("dir/", Array.emptyByteArray, '5') ++
      Tar.entryBytes("8.txt", "q".getBytes(UTF_8)) ++ new Array[Byte](1024)
    assert(Tar.parseEntries(d).toSeq.map(_.name) == Seq("8.txt"))
    val bad = Tar.entryBytes("9.lnk", Array.emptyByteArray, '2') ++
      new Array[Byte](1024)
    val e = intercept[IllegalArgumentException](Tar.parseEntries(bad).toSeq)
    assert(e.getMessage.contains("typeflag"))
    // malformed pax record lengths are LOUD
    val corrupt = Tar.entryBytes("PaxHeaders.0/x", "999 path=/a\n".getBytes(UTF_8), 'x') ++
      Tar.entryBytes("1.txt", "t".getBytes(UTF_8), '0') ++ new Array[Byte](1024)
    intercept[IllegalArgumentException](Tar.parseEntries(corrupt).toSeq)
  }

  test("a global 'g' header between 'x' and its file passes the override through") {
    // POSIX pax: an 'x' record applies to the next FILE entry; an
    // intervening 'g' metadata record must not consume it (libarchive
    // and GNU tar agree) — real archives ship exactly this layout
    val longPath = "deep/" + ("n" * 110) + "/55.txt"
    val tar = Tar.paxEntryBytes(Seq("path" -> longPath)) ++
      Tar.entryBytes("pax_global", Tar.paxRecord("comment", "vendor"), 'g') ++
      Tar.entryBytes("55.tmp", "payload".getBytes(UTF_8)) ++
      Tar.entryBytes("56.txt", "after".getBytes(UTF_8)) ++
      new Array[Byte](1024)
    val es = Tar.parseEntries(tar).toSeq
    assert(es.map(_.name) == Seq(longPath, "56.txt"))
    assert(new String(es.head.content, UTF_8) == "payload")
    // a directory entry still CONSUMES the pending override
    val viaDir = Tar.paxEntryBytes(Seq("path" -> longPath)) ++
      Tar.entryBytes("dir/", Array.emptyByteArray, '5') ++
      Tar.entryBytes("57.txt", "x".getBytes(UTF_8)) ++
      new Array[Byte](1024)
    assert(Tar.parseEntries(viaDir).toSeq.map(_.name) == Seq("57.txt"))
  }

  test("interop: commons-compress reads our pax shards identically") {
    // a THIRD-PARTY tar implementation must see the same entries —
    // names (pax override applied), contents, order
    val longPath = "wds/" + ("m" * 105) + "/5.txt"
    val tar = Tar.entryBytes("5.json", """{"k":1}""".getBytes(UTF_8)) ++
      Tar.paxEntryBytes(Seq("path" -> longPath)) ++
      Tar.entryBytes("5.tmp", "payload".getBytes(UTF_8)) ++
      Tar.entryBytes("6.txt", "tail".getBytes(UTF_8)) ++
      new Array[Byte](1024)
    val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new java.io.ByteArrayInputStream(tar))
    val theirs = Iterator.continually(tin.getNextEntry)
      .takeWhile(_ != null)
      .map(e => e.getName -> new String(tin.readAllBytes(), UTF_8))
      .toSeq
    tin.close()
    val ours = Tar.parseEntries(tar).toSeq
      .map(e => e.name -> new String(e.content, UTF_8))
    assert(theirs == ours)
    assert(ours.map(_._1) == Seq("5.json", longPath, "6.txt"))
  }
}
