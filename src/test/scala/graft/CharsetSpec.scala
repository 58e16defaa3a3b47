package graft

import java.nio.charset.StandardCharsets

import graft.sources.Charset

/** Charset sniffing: BOM detection, strict-UTF-8-then-Latin-1 fallback,
  * and the cross-encoding equality that makes the ingest correct — the
  * SAME logical text must land identically from every wire form. */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private val sample = "plain ascii then protégé Ærø ß° the end"

  test("every wire form decodes back to the identical logical text") {
    for (enc <- Charset.Encodings) {
      val (detected, text) = Charset.sniffDecode(Charset.encodeBytes(sample, enc))
      assert(text == sample, s"$enc round trip")
      assert(detected == (if (enc == "latin-1" || enc == "utf-8") enc else enc),
        s"$enc detected as $detected")
    }
  }

  test("detection routes: BOMs win; no-BOM valid multibyte stays UTF-8; invalid falls back") {
    // valid multi-byte UTF-8 without BOM must NOT be misrouted to Latin-1
    assert(Charset.sniffDecode(sample.getBytes(StandardCharsets.UTF_8))._1 == "utf-8")
    // a lone 0xE9 ('é' in Latin-1) is invalid UTF-8 → fallback
    val latin = sample.getBytes(StandardCharsets.ISO_8859_1)
    assert(latin.exists(b => (b & 0xff) > 0x7f)) // the fixture really is non-ASCII
    assert(Charset.sniffDecode(latin)._1 == "latin-1")
    // BOM bytes are consumed, never leaked into the text
    for (enc <- Seq("utf-8-bom", "utf-16le", "utf-16be")) {
      val (d, t) = Charset.sniffDecode(Charset.encodeBytes(sample, enc))
      assert(d == enc && !t.startsWith("﻿"), s"$enc leaked its BOM")
    }
    // ASCII-only no-BOM content is utf-8 (the common case)
    assert(Charset.sniffDecode("just ascii".getBytes(StandardCharsets.US_ASCII))._1 == "utf-8")
    // empty file: utf-8, empty text
    assert(Charset.sniffDecode(Array.emptyByteArray) == (("utf-8", "")))
  }

  test("BOM-less UTF-16 is caught by the NUL-parity sniff, never lands as Latin-1") {
    val le = sample.getBytes(StandardCharsets.UTF_16LE)
    val be = sample.getBytes(StandardCharsets.UTF_16BE)
    assert(Charset.sniffDecode(le) == (("utf-16le-nobom", sample)))
    assert(Charset.sniffDecode(be) == (("utf-16be-nobom", sample)))
    // guards: the sniff must be one-sided and even-length —
    // a NUL-free Latin-1 body stays Latin-1
    assert(Charset.sniffDecode(sample.getBytes(StandardCharsets.ISO_8859_1))._1 == "latin-1")
    // NULs on BOTH parities (binary-ish payload): NOT detected as
    // UTF-16 — it falls through to the strict-UTF-8 stage (NUL is a
    // valid UTF-8 code point, so it lands as utf-8 with NULs intact)
    val both = Array[Byte](0, 'a', 0, 0, 'b', 0, 0, 'a', 0, 0, 'b', 0)
    assert(Charset.sniffDecode(both)._1 == "utf-8")
    // odd total length cannot be UTF-16: not detected (the é high
    // byte makes the UTF-8 stage fail too → Latin-1, not utf-16)
    assert(Charset.sniffDecode(le :+ 'x'.toByte)._1 == "latin-1")
    // a detected-but-corrupt body (dangling surrogate) fails LOUDLY:
    // the detection is a declaration, same policy as a BOM
    val surrogate = Array[Byte]('a', 0, 0x41, 0xD8.toByte, 'b', 0, 'c', 0, 'd', 0)
    intercept[java.nio.charset.CharacterCodingException] {
      Charset.sniffDecode(surrogate)
    }
  }

  test("BOM-marked files with corrupt bodies fail loudly, not as mojibake") {
    // break é's continuation byte: 0xC3 0xA9 → 0xC3 0x41, invalid UTF-8
    val bad = Charset.encodeBytes(sample, "utf-8-bom")
    val i = bad.indexWhere(b => (b & 0xff) == 0xC3)
    assert(i > 0); bad(i + 1) = 0x41
    intercept[java.nio.charset.CharacterCodingException] { Charset.sniffDecode(bad) }
    // odd byte count after a UTF-16 BOM: dangling half code unit
    val oddUtf16 = Charset.encodeBytes(sample, "utf-16le").dropRight(1)
    intercept[java.nio.charset.CharacterCodingException] { Charset.sniffDecode(oddUtf16) }
  }

  test("distributed round trip: uniform UTF-8 text, correct per-file report") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Charset.roundTrip(spark, docs, "/root/testdata/sf0.001")
      .select("doc_id", "encoding", "n_bytes", "n_chars", "text")
      .as[(Long, String, Long, Long, String)].collect().toSeq
    val want = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
      .sortBy(_._1).map { case (id, t) =>
        val salted = t + Charset.Salt
        val enc = Charset.encodingOf(id)
        (id, enc, salted.getBytes(Charset.charsetOf(enc)).length.toLong,
          salted.length.toLong, salted)
      }
    assert(got == want)
    // all seven encodings genuinely exercised
    assert(got.map(_._2).distinct.toSet == Charset.Encodings.toSet)
  }
}
