package graft

import graft.apps.WordCount
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden-parity spot check (SURVEY §5.2.4): the reference's checked-in
  * word-count golden (`final_wc.txt`, 4,477 words / 28,634 tokens from one
  * real 2020 run) round-trips through this engine exactly.
  *
  * The original input corpus is not checked into the reference, so the
  * check is the inverse derivation: rebuild a corpus realizing the golden
  * multiset, run the engine's word count, and require the exact multiset
  * back. This pins (a) count conservation on the reference's real
  * vocabulary, and (b) tokenizer idempotence on every word the reference's
  * Unicode normalizer produced — `protégé`, bare `é`, `430zip`, digits.
  * Golden quirks normalized per SURVEY §2.1: the file is Latin-1 and has
  * exactly reduce_num=50 bracket-less lines from the final-flush bug.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  private val goldenPath = "/root/reference/final_wc.txt"
  private val line = """^(\S*) - \[?(\d+)\]?$""".r

  test("final_wc.txt multiset round-trips through wordCount") {
    assume(Files.exists(Paths.get(goldenPath)))
    val golden: Map[String, Long] =
      new String(Files.readAllBytes(Paths.get(goldenPath)), StandardCharsets.ISO_8859_1)
        .linesIterator.filter(_.nonEmpty).map {
          case line(w, n) => w -> n.toLong
          case other => fail(s"unparseable golden line: '$other'")
        }.toMap
    assert(golden.size == 4477)
    assert(golden.values.sum == 28634L)
    assert(golden.contains("protégé") && golden.contains("à") && golden.contains("430zip"))

    // realize the multiset as a corpus (chunked into docs of ~2k tokens)
    val tokens = golden.iterator.flatMap { case (w, n) => Iterator.fill(n.toInt)(w) }.toSeq
    val docs = tokens.grouped(2000).zipWithIndex
      .map { case (ts, i) => (ts.mkString(" "), s"doc$i") }.toSeq
      .toDF("text", "source")

    val got = WordCount.wordCount(docs).as[(String, Long)].collect().toMap
    assert(got == golden)
  }

  test("sample_test_case_2 (two-doc union) multiset round-trips") {
    val p = "/root/reference/sample_test_case_2_final_wc.txt"
    assume(Files.exists(Paths.get(p)))
    val golden: Map[String, Long] =
      new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.ISO_8859_1)
        .linesIterator.filter(_.nonEmpty).map {
          case line(w, n) => w -> n.toLong
          case other => fail(s"unparseable golden line: '$other'")
        }.toMap
    assert(golden.size == 7650)
    // realize as TWO source documents and count through the union path
    val tokens = golden.iterator.flatMap { case (w, n) => Iterator.fill(n.toInt)(w) }.toSeq
    val (h1, h2) = tokens.splitAt(tokens.size / 2)
    val docs = Seq((h1.mkString(" "), "docA"), (h2.mkString(" "), "docB"))
      .toDF("text", "source")
    val got = WordCount.wordCount(docs).as[(String, Long)].collect().toMap
    assert(got == golden)
  }

  test("sample_test_case_1 (single-doc config) == gcp_wc run; round-trips") {
    // the checked-in test_case_1 golden (UTF-8) and the real GCP wc run
    // (Latin-1) are the same FlyingFish word count — assert that, then
    // round-trip the multiset once
    val p1 = Paths.get("/root/reference/sample_test_case_1_final_wc.txt")
    val p2 = Paths.get("/root/reference/sample_output_gcp_wc.txt")
    assume(Files.exists(p1) && Files.exists(p2))
    def parse(p: java.nio.file.Path, cs: java.nio.charset.Charset): Map[String, Long] =
      new String(Files.readAllBytes(p), cs).linesIterator.filter(_.nonEmpty).map {
        case line(w, n) => w -> n.toLong
        case other => fail(s"unparseable golden line: '$other'")
      }.toMap
    val g1 = parse(p1, StandardCharsets.UTF_8)
    val g2 = parse(p2, StandardCharsets.ISO_8859_1)
    // identical counts except 2 accented words the UTF-8 transport
    // corrupted to U+FFFD in test_case_1 (same bug as gcp_id); the clean
    // Latin-1 gcp_wc carries them intact. The exclusion below is
    // REFERENCE-BUG-AWARE normalization: it compensates for the
    // reference's own mojibake in its checked-in golden, not for any
    // engine-side encoding behavior (this engine is UTF-8 end to end)
    assert(g1.filterNot(_._1.contains('�')) == g2.filter(e => !Set("schweitzerkäse", "blasé")(e._1)),
      "test_case_1 and the gcp_wc run must agree modulo mojibake")
    assert(g2.size == 5324 && g2.values.sum == 38828L)
    val tokens = g2.iterator.flatMap { case (w, n) => Iterator.fill(n.toInt)(w) }.toSeq
    val docs = Seq((tokens.mkString(" "), "FlyingFish.txt")).toDF("text", "source")
    val got = WordCount.wordCount(docs).as[(String, Long)].collect().toMap
    assert(got == g2)
  }

  private val idGoldenPath = "/root/reference/sample_output_gcp_id.txt"
  private val idLine = """^(\S*) - \[?\{(.*)\}\]?$""".r
  private val entry = """'([^']+)': (\d+)""".r

  /** Parse an inverted-index golden, rebuild a corpus realizing its
    * postings, run the engine's inverted index, require the exact
    * postings back. Pins the reference's full 4-config test matrix
    * (`test_interface.py:6`, `test_config_{3,4}.py`). */
  private def idRoundTrip(path: String, charset: java.nio.charset.Charset,
                          expectWords: Int, expectDocs: Set[String]): Unit = {
    val golden: Map[(String, String), Long] =
      new String(Files.readAllBytes(Paths.get(path)), charset)
        .linesIterator.filter(_.nonEmpty).flatMap {
          case idLine(w, dict) =>
            entry.findAllMatchIn(dict).map(m => (w, m.group(1)) -> m.group(2).toLong)
          case other => fail(s"unparseable golden line: '$other'")
        }.toMap
    assert(golden.map(_._1._1).toSet.size == expectWords)
    assert(golden.keysIterator.map(_._2).toSet == expectDocs)
    val docs = expectDocs.toSeq.sorted.map { d =>
      val text = golden.collect { case ((w, `d`), n) =>
        Iterator.fill(n.toInt)(w).mkString(" ") }.mkString(" ")
      (text, d)
    }.toDF("text", "source")
    val got = graft.apps.InvertedIndex.flat(docs)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == golden)
  }

  test("sample_test_case_3_final_id.txt (3-doc id config) round-trips") {
    // Latin-1 like final_wc.txt, accents intact (blasé, protégé,
    // schweitzerkäse) — no mojibake exclusions; 50 bracket-less lines
    // from the reduce_num=50 final-flush bug handled by the parser.
    val p = "/root/reference/sample_test_case_3_final_id.txt"
    assume(Files.exists(Paths.get(p)))
    idRoundTrip(p, StandardCharsets.ISO_8859_1, 9687,
      Set("FlyingFish.txt", "JekyllHyde.txt", "ChristmasCarol.txt"))
  }

  test("sample_test_case_4_final_id.txt (2-doc id config) round-trips") {
    val p = "/root/reference/sample_test_case_4_final_id.txt"
    assume(Files.exists(Paths.get(p)))
    idRoundTrip(p, StandardCharsets.ISO_8859_1, 7960,
      Set("FlyingFish.txt", "ChristmasCarol.txt"))
  }

  test("sample_output_gcp_id.txt postings round-trip through invertedIndex") {
    assume(Files.exists(Paths.get(idGoldenPath)))
    // golden: word -> {doc -> cnt} over the reference's real 3-doc corpus.
    // NOTE: unlike final_wc.txt (clean Latin-1), this golden is UTF-8 and
    // the reference's own transport corrupted accents to U+FFFD in 5 words
    // (`blas�`, `prot�g�`, ...) — its normalizer would have
    // stripped � had it been in the input, so the corruption is
    // downstream of compute. Those 5 words are excluded; accent handling
    // itself is pinned by the wc golden above.
    val all: Map[(String, String), Long] =
      new String(Files.readAllBytes(Paths.get(idGoldenPath)), StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).flatMap {
          case idLine(w, dict) =>
            entry.findAllMatchIn(dict).map(m => (w, m.group(1)) -> m.group(2).toLong)
          case other => fail(s"unparseable golden line: '$other'")
        }.toMap
    assert(all.map(_._1._1).toSet.size == 9687) // 9,687 distinct words
    val golden = all.filterNot(_._1._1.contains('�'))
    assert(all.size - golden.size <= 6)
    val docNames = golden.keysIterator.map(_._2).toSet
    assert(docNames == Set("FlyingFish.txt", "JekyllHyde.txt", "ChristmasCarol.txt"))

    // realize per-doc corpora from the postings and invert them back
    val docs = docNames.toSeq.sorted.map { d =>
      val text = golden.collect { case ((w, `d`), n) =>
        Iterator.fill(n.toInt)(w).mkString(" ") }.mkString(" ")
      (text, d)
    }.toDF("text", "source")
    val got = graft.apps.InvertedIndex.flat(docs)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == golden)
  }
}
