package graft

import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Truncated UTF-8 string bands in the log's stats map: text-predicate
  * file pruning with zero footer opens (corruption-proof), the Delta
  * 32-char truncation convention (lower = prefix, upper = incremented
  * prefix), binary-UTF-8 ordering, and checkpoint round-trips. */
class LakeStringStatsSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lss_${name}_${System.nanoTime()}"

  import spark.implicits._

  private def garbage(table: String, keep: Set[String]): Int = {
    val dir = java.nio.file.Paths.get(table, "data")
    var n = 0
    java.nio.file.Files.list(dir).forEach { p =>
      if (!p.getFileName.toString.endsWith(".crc") &&
        !keep.contains(s"data/${p.getFileName}")) {
        java.nio.file.Files.write(p, Array.fill[Byte](64)(0x5A))
        n += 1
      }
    }
    n
  }

  test("string bands record and prune; skipped files are never opened (corruption proof)") {
    val t = freshDir("prune")
    val langs = Seq("de", "en", "es", "fr", "zh")
    val d = (0L until 200L).map(i => (i, langs((i % 5).toInt), s"text $i"))
      .toDF("k", "lang", "text")
      .repartitionByRange(5, col("lang"), col("k"))
    // governing schema first: scan planning must never open a data file
    // (schema-on-log), or the corruption proof below would be unfair
    LakeTxn.createTable(spark, t, d.schema)
    LakeTxn.appendCommitStatsMulti(spark, d, t, Seq("lang", "k"))
    val snap = LakeTxn.snapshot(spark, t)
    // every file carries a string band for lang AND an int band for k
    snap.adds.foreach { a =>
      assert(LakeTxn.decodeSxStr(a.sx).contains("lang"))
      val (lo, hi, _) = LakeTxn.decodeSx(a.sx)("k")
      assert(lo <= hi)
    }
    // the INT view of a string entry is the no-band sentinel with nn
    val (slo, shi, snn) = LakeTxn.decodeSx(snap.adds.head.sx)("lang")
    assert(slo > shi && snn === 0L)
    // which files CAN hold lang >= 'fr'? (range layout: fr/zh cluster)
    val hit = snap.adds.filter(a =>
      graft.sources.LakePrune.allowsAll(a,
        Array(org.apache.spark.sql.sources.GreaterThanOrEqual("lang", "fr"))))
    assert(hit.size < snap.adds.size, "the de/en/es files must prune")
    // corrupt everything the prune skips: the read must never open them
    garbage(t, hit.map(_.file).toSet)
    val got = spark.read.format("graft-lake").load(t)
      .filter(col("lang") >= "fr")
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got === (0L until 200L).filter(i => i % 5 == 3 || i % 5 == 4))
  }

  test("equality, IN, ranges and startsWith prune on string bands; checkpoint round-trips") {
    val t = freshDir("ops")
    val d = (0L until 90L).map(i =>
      (i, Seq("alpha", "mid", "zulu")((i % 3).toInt) + s"_${i % 7}"))
      .toDF("k", "s")
      .repartitionByRange(3, col("s"))
    LakeTxn.appendCommitStatsMulti(spark, d, t, Seq("s", "k"))
    LakeTxn.checkpointLog(spark, t)
    LakeTxn.appendCommit(spark, Seq((1000L, "alpha_x")).toDF("k", "s"), t)
    // the checkpointed fold preserves the string bands verbatim
    val snap = LakeTxn.snapshot(spark, t)
    val withBand = snap.adds.filter(a => LakeTxn.decodeSxStr(a.sx).contains("s"))
    assert(withBand.size === 3)
    import org.apache.spark.sql.sources._
    def hits(f: Filter): Int =
      snap.adds.count(a => graft.sources.LakePrune.allowsAll(a, Array(f)))
    val total = snap.adds.size // 4: three banded + one band-less append
    assert(hits(EqualTo("s", "zulu_1")) < total)
    assert(hits(In("s", Array("zulu_1", "zzz"))) < total)
    assert(hits(LessThan("s", "alpha")) < total) // nothing below 'alpha'
    assert(hits(GreaterThan("s", "zz")) < total)
    assert(hits(StringStartsWith("s", "zu")) < total)
    // band-less files always admit (the stats-free append must never prune)
    assert(snap.adds.filter(a => !LakeTxn.decodeSxStr(a.sx).contains("s"))
      .forall(a => graft.sources.LakePrune.allowsAll(a,
        Array(EqualTo("s", "anything")))))
    // content through the connector, filters pushed
    assert(spark.read.format("graft-lake").load(t)
      .filter(col("s").startsWith("zulu")).count() === 30L)
  }

  test("truncation: long strings band by 32-cp prefix with an incremented upper bound") {
    // the bound helpers themselves
    val long = "a" * 40
    assert(LakeTxn.sxStrLower(long) === "a" * 32)
    assert(LakeTxn.sxStrUpper(long) === Some("a" * 31 + "b"))
    assert(LakeTxn.sxStrUpper("short") === Some("short"))
    // multibyte: truncation counts code points, not chars
    val uni = "é" * 40
    assert(LakeTxn.sxStrLower(uni) === "é" * 32)
    assert(LakeTxn.sxStrUpper(uni) === Some("é" * 31 + "ê"))
    // a supplementary character (surrogate pair) stays intact
    val emoji = "😀" // U+1F600
    val mixed = emoji * 40
    assert(LakeTxn.sxStrLower(mixed) === emoji * 32)
    // end-to-end: a file of >32-cp strings still prunes correctly
    val t = freshDir("trunc")
    import spark.implicits._
    val d = (0L until 40L).map(i => (i, f"prefix_${i % 2}%d_" + ("x" * 40)))
      .toDF("k", "s").repartitionByRange(2, col("s"))
    LakeTxn.appendCommitStatsMulti(spark, d, t, Seq("s"))
    val snap = LakeTxn.snapshot(spark, t)
    import org.apache.spark.sql.sources._
    // a probe between the two prefixes prunes one side; every recorded
    // band must still ADMIT the true values it covers
    snap.adds.foreach { a =>
      val band = LakeTxn.decodeSxStr(a.sx)("s")
      assert(band._1.length <= 34 && band._2.length <= 34) // truncated
    }
    val eq0 = snap.adds.count(a => graft.sources.LakePrune.allowsAll(a,
      Array(EqualTo("s", "prefix_0_" + ("x" * 40)))))
    assert(eq0 >= 1 && eq0 < snap.adds.size)
    assert(spark.read.format("graft-lake").load(t)
      .filter(col("s") === ("prefix_1_" + ("x" * 40))).count() === 20L)
  }

  test("binary UTF-8 ordering governs the bands (not UTF-16 code units)") {
    // U+FFFD (3-byte UTF-8) vs U+1F600 (4-byte, surrogate pair in UTF-16):
    // UTF-16 code-unit order would sort the emoji FIRST (0xD83D < 0xFFFD);
    // binary UTF-8 (= code point) order sorts it LAST
    assert(LakeTxn.utf8Cmp("�", "😀") < 0)
    assert("�".compareTo("😀") > 0) // the trap this avoids
    val t = freshDir("ord")
    import spark.implicits._
    val d = Seq((1L, "a"), (2L, "�"), (3L, "😀"))
      .toDF("k", "s").repartition(1)
    LakeTxn.appendCommitStatsMulti(spark, d, t, Seq("s"))
    val (lo, hi) = LakeTxn.decodeSxStr(
      LakeTxn.snapshot(spark, t).adds.head.sx)("s")
    assert(lo === "a" && hi === "😀")
    // a probe above the emoji must be prunable; one between must admit
    import org.apache.spark.sql.sources._
    val a = LakeTxn.snapshot(spark, t).adds.head
    assert(graft.sources.LakePrune.allowsAll(a, Array(EqualTo("s", "�"))))
    assert(!graft.sources.LakePrune.allowsAll(a,
      Array(GreaterThan("s", "😀"))))
  }

  test("a block with rows but no stats yields the no-band sentinel (never a narrowed band)") {
    // engineered through the encode/decode layer: the footer path cannot
    // produce such files with parquet-mr today (the latent hole the
    // completeness flag closes), so pin the SENTINEL's read-side
    // semantics — lo > hi admits every predicate
    val sx = LakeTxn.encodeSxBands(Seq("c" -> LakeTxn.sxNoBand(5L)))
    assert(LakeTxn.decodeSx(sx)("c") === ((1L, 0L, 5L)))
    assert(LakeTxn.decodeSxStr(sx).isEmpty)
    val a = LakeTxn.Action(add = true, "data/x.parquet", 10L, sx = sx)
    import org.apache.spark.sql.sources._
    assert(graft.sources.LakePrune.allowsAll(a, Array(
      EqualTo("c", 123L), LessThan("c", -5L), GreaterThan("c", 1L))))
    // but its nullCount still prunes IS NULL when zero... (nn=5 here: admits)
    assert(graft.sources.LakePrune.allowsAll(a, Array(IsNull("c"))))
  }
}
