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
}
