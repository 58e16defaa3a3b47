package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Warc

/** WARC framing: byte-exact round trip through Content-Length framing,
  * non-response records skipped, loud failure on broken frames. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  test("record bytes: header block, byte-counted payload, CRLF CRLF terminator") {
    val payload = "héllo\r\nWARC/1.0\r\n".getBytes(UTF_8)
    val rec = Warc.recordBytes("response",
      Seq("WARC-Target-URI" -> "https://web.example/7"), payload)
    val s = new String(rec, UTF_8)
    assert(s.startsWith("WARC/1.0\r\nWARC-Type: response\r\n"))
    assert(s.contains(s"Content-Length: ${payload.length}\r\n"))
    assert(s.endsWith("\r\n\r\n"))
    // Content-Length counts BYTES: é is 2 bytes, so != char count
    assert(payload.length != "héllo\r\nWARC/1.0\r\n".length)
  }

  test("parser honors byte framing across a version-line lookalike; skips warcinfo") {
    val tricky = ("payload with an embedded\r\nWARC/1.0\r\nversion lookalike " +
      "and unicode ☃é—").getBytes(UTF_8)
    val file =
      Warc.recordBytes("warcinfo", Seq("WARC-Filename" -> "t.warc"),
        "software: graft\r\n".getBytes(UTF_8)) ++
      Warc.recordBytes("response",
        Seq("WARC-Target-URI" -> "https://a.example/1",
          "WARC-Graft-Lang" -> "en"), tricky) ++
      Warc.recordBytes("metadata", Seq.empty, "x".getBytes(UTF_8)) ++
      Warc.recordBytes("response",
        Seq("WARC-Target-URI" -> "https://b.example/2",
          "WARC-Graft-Lang" -> "de"), Array.emptyByteArray)
    val recs = Warc.parseRecords(file).toSeq
    assert(recs.map(_.uri) == Seq("https://a.example/1", "https://b.example/2"))
    assert(recs.map(_.lang) == Seq("en", "de"))
    assert(recs.head.payload.toSeq == tricky.toSeq)
    assert(recs(1).payload.isEmpty)
  }

  test("broken frames fail loudly (FAILFAST: the fixture is engine-written)") {
    val good = Warc.recordBytes("response",
      Seq("WARC-Target-URI" -> "https://a.example/1"), "abc".getBytes(UTF_8))
    // truncated payload: Content-Length overruns the file
    intercept[IllegalArgumentException] {
      Warc.parseRecords(good.dropRight(5)).toSeq
    }
    // corrupted terminator
    val bad = good.clone(); bad(bad.length - 1) = 'X'
    intercept[IllegalArgumentException] { Warc.parseRecords(bad).toSeq }
    // garbage before the version line
    intercept[IllegalArgumentException] {
      Warc.parseRecords("not a warc\r\n".getBytes(UTF_8) ++ good).toSeq
    }
  }

  test("distributed round trip preserves every salted payload byte-exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Warc.roundTrip(spark, docs, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_bytes", "text")
      .as[(Long, String, Long, String)].collect().toSeq
    val want = docs.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, lang, text) =>
        val salted = text + Warc.PayloadSalt
        (id, lang, salted.getBytes(UTF_8).length.toLong, salted)
      }
    assert(got == want)
    // the salt genuinely contains a version-line lookalike
    assert(Warc.PayloadSalt.contains("WARC/1.0"))
  }

  test("gzip members: one record per member, boundaries honored, java-interoperable") {
    val recA = Warc.recordBytes("response",
      Seq("WARC-Target-URI" -> "https://a.example/1", "WARC-Graft-Lang" -> "en"),
      "first ☃ body\r\nWARC/1.0\r\n".getBytes(UTF_8))
    val recB = Warc.recordBytes("response",
      Seq("WARC-Target-URI" -> "https://b.example/2", "WARC-Graft-Lang" -> "de"),
      "second".getBytes(UTF_8))
    val file = Warc.gzipMemberBytes(recA) ++ Warc.gzipMemberBytes(recB)
    // member walk: exactly two members, each decoding to ITS record
    val members = Warc.parseGzipMembers(file).toSeq
    assert(members.length == 2)
    assert(members(0).toSeq == recA.toSeq && members(1).toSeq == recB.toSeq)
    // each member frames exactly one WARC record
    assert(members.map(m => Warc.parseRecords(m).length) == Seq(1, 1))
    // a standard gzip reader must accept our members (RFC 1952 conformance):
    // GZIPInputStream decodes concatenated members to the concatenation
    val gis = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(file))
    assert(gis.readAllBytes().toSeq == (recA ++ recB).toSeq)
  }

  test("gzip members: corrupt/truncated members fail loudly, never truncate silently") {
    val rec = Warc.recordBytes("response",
      Seq("WARC-Target-URI" -> "https://a.example/1"), "abcdef".getBytes(UTF_8))
    val member = Warc.gzipMemberBytes(rec)
    // flipped trailer CRC byte
    val badCrc = member.clone(); badCrc(member.length - 8) = (badCrc(member.length - 8) ^ 0xff).toByte
    intercept[IllegalArgumentException] { Warc.parseGzipMembers(badCrc).toSeq }
    // flipped ISIZE byte
    val badSize = member.clone(); badSize(member.length - 1) = (badSize(member.length - 1) ^ 0x7f).toByte
    intercept[IllegalArgumentException] { Warc.parseGzipMembers(badSize).toSeq }
    // truncated mid-body
    intercept[Exception] { Warc.parseGzipMembers(member.dropRight(12)).toSeq }
    // garbage between members (bad magic)
    intercept[IllegalArgumentException] {
      Warc.parseGzipMembers(member ++ "junk".getBytes(UTF_8) ++ member).toSeq
    }
  }

  test("distributed .warc.gz round trip matches the plain-WARC frame") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val gz = Warc.roundTripGz(spark, docs, "/root/testdata/sf0.001")
      .select("doc_id", "url", "lang", "n_bytes", "text")
      .as[(Long, String, String, Long, String)].collect().toSeq
    val plain = Warc.roundTrip(spark, docs, "/root/testdata/sf0.001")
      .select("doc_id", "url", "lang", "n_bytes", "text")
      .as[(Long, String, String, Long, String)].collect().toSeq
    assert(gz == plain)
    assert(gz.nonEmpty)
  }
}
