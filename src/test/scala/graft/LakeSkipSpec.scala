package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** Multi-dimensional and point-lookup data skipping recorded in the
  * commit log: z-order clustering makes BOTH dimensions prunable (a
  * linear sort only its own key), and per-file bloom filters answer
  * point lookups opening only possibly-matching files. Skipped files
  * are proven never-opened by corrupting them on disk. */
class LakeSkipSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lskip_${name}_${System.nanoTime()}"

  /** A 64×64 integer grid: every (x, y) pair with both in [0, 64). */
  private def grid(): DataFrame = {
    import spark.implicits._
    (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong))
      .toDF("id", "x", "y")
  }

  private def garbage(table: String, keep: Set[String]): Int = {
    val dir = java.nio.file.Paths.get(table, "data")
    var n = 0
    java.nio.file.Files.list(dir).forEach { p =>
      // leave checksum sidecars alone: corrupting a kept file's .crc
      // would fail ITS read through the local checksum filesystem
      if (!p.getFileName.toString.endsWith(".crc") &&
        !keep.contains(s"data/${p.getFileName}")) {
        java.nio.file.Files.write(p, Array.fill[Byte](64)(0x5A))
        n += 1
      }
    }
    n
  }

  test("z-order: bands on EITHER dimension prune; a linear sort prunes only its key") {
    val zt = freshDir("z")
    LakeTxn.appendCommitZorder(spark, grid(), zt, "x", "y", files = 16, bits = 6)
    val lt = freshDir("lin")
    // same data linearly sorted on x, same file count, same stats cols
    LakeTxn.commit(spark, lt, LakeTxn.stage(spark,
      grid().repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions("x", "y"), lt,
      statsCol = "x", statsCol2 = "y"), Nil)

    // x-band: both layouts prune
    val (zx, zxScan, zxTot) = LakeTxn.readPruned2(spark, zt, "x", 8, 15, "y", 0, 63)
    val (lx, lxScan, _) = LakeTxn.readPruned2(spark, lt, "x", 8, 15, "y", 0, 63)
    assert(zxTot === 16)
    assert(zxScan < 16, "z-order must prune an x band")
    assert(lxScan < 16, "a linear x sort must prune an x band")
    assert(zx.count() === 8L * 64 && lx.count() === 8L * 64)

    // y-band: ONLY the z-order layout prunes — the linear sort scatters y
    val (zy, zyScan, _) = LakeTxn.readPruned2(spark, zt, "x", 0, 63, "y", 8, 15)
    val (ly, lyScan, _) = LakeTxn.readPruned2(spark, lt, "x", 0, 63, "y", 8, 15)
    assert(zyScan < 16, "z-order must prune a y band")
    assert(lyScan === 16, "a linear x sort cannot prune a y band")
    assert(zy.count() === 8L * 64 && ly.count() === 8L * 64)

    // 2-D box: content equals the plain filter, and skipped files are
    // NEVER opened (corrupt them and read again)
    val (box, boxScan, _) = LakeTxn.readPruned2(spark, zt, "x", 8, 15, "y", 48, 55)
    val want = grid().filter(col("x").between(8, 15) && col("y").between(48, 55))
      .orderBy("id").collect().map(_.mkString("|"))
    assert(box.orderBy("id").collect().map(_.mkString("|")) === want)
    assert(boxScan < zxScan, "a box must prune harder than its x band alone")
    val snap = LakeTxn.snapshot(spark, zt)
    val kept = snap.adds.filter(a =>
      a.hi >= 8 && a.lo <= 15 && a.hi2 >= 48 && a.lo2 <= 55).map(_.file).toSet
    assert(garbage(zt, kept) > 0, "some file must have been skippable")
    val (again, _, _) = LakeTxn.readPruned2(spark, zt, "x", 8, 15, "y", 48, 55)
    assert(again.orderBy("id").collect().map(_.mkString("|")) === want)
  }

  test("z-order stats survive a log checkpoint") {
    val t = freshDir("zckpt")
    LakeTxn.appendCommitZorder(spark, grid(), t, "x", "y", files = 8, bits = 6)
    LakeTxn.checkpointLog(spark, t)
    LakeTxn.appendCommit(spark,
      grid().withColumn("id", col("id") + 10000L).repartition(1), t) // stats-free file
    val (df, scanned, total) = LakeTxn.readPruned2(spark, t, "x", 0, 7, "y", 0, 7)
    assert(total === 9)
    // the stats-free file is kept conservatively; checkpointed stats prune
    assert(scanned < 9)
    assert(df.filter(col("id") < 10000).count() ===
      grid().filter(col("x") < 8 && col("y") < 8).count())
  }

  test("OPTIMIZE ZORDER: unclustered appends become 2-D prunable; time travel keeps the old layout") {
    val t = freshDir("optz")
    // three unclustered stat-less appends: no pruning possible
    for (r <- 0 until 3)
      LakeTxn.appendCommit(spark, grid().filter(col("id") % 3 === r)
        .repartition(4), t)
    val (pre, preScan, preTot) = LakeTxn.readPruned2(spark, t, "x", 8, 15, "y", 48, 55)
    assert(preTot === 12 && preScan === 12,
      "stat-less files must all be kept conservatively")
    val want = grid().filter(col("x").between(8, 15) && col("y").between(48, 55))
      .orderBy("id").collect().map(_.mkString("|"))
    assert(pre.orderBy("id").collect().map(_.mkString("|")) === want)

    val v = LakeTxn.optimizeZorder(spark, t, "x", "y", files = 16, bits = 6)
    val (post, postScan, postTot) = LakeTxn.readPruned2(spark, t, "x", 8, 15, "y", 48, 55)
    assert(postTot === 16 && postScan < 4,
      s"the optimized layout must prune the box hard ($postScan of $postTot)")
    assert(post.orderBy("id").collect().map(_.mkString("|")) === want)

    // time travel to the pre-optimize version still reads the old files
    val old = LakeTxn.read(spark, t, Some(v - 1))
    assert(old.count() === 64L * 64)

    // a DV'd table: optimize materializes the merge and purges vectors
    LakeTxn.deleteWhereMor(spark, t, col("x") === 0)
    assert(LakeTxn.snapshot(spark, t).dvs.nonEmpty)
    LakeTxn.optimizeZorder(spark, t, "x", "y", files = 8, bits = 6)
    val snap2 = LakeTxn.snapshot(spark, t)
    assert(snap2.dvs.isEmpty, "optimize must purge materialized vectors")
    assert(LakeTxn.read(spark, t).count() === 64L * 63)
  }

  test("OPTIMIZE ZORDER aborts when an interleaved rewrite removed its base") {
    val t = freshDir("optconflict")
    LakeTxn.appendCommit(spark, grid().repartition(4), t)
    val snap = LakeTxn.snapshot(spark, t)
    // an interleaved compaction lands first, removing every base file
    LakeTxn.compactCommit(spark, t, Long.MaxValue / 4)
    // a stale optimize computed at `snap` must abort, not resurrect
    val z = Zholder.cluster(spark, t, snap)
    assertThrows[LakeTxn.CommitConflictException](
      LakeTxn.commitAt(spark, t, snap.version,
        LakeTxn.stage(spark, z, t, statsCol = "x", statsCol2 = "y"),
        snap.files))
    assert(LakeTxn.read(spark, t).count() === 64L * 64)
  }

  /** Helper reproducing optimizeZorder's staging against a PINNED stale
    * snapshot (the public API always re-snapshots, so the conflict needs
    * the pieces). */
  private object Zholder {
    def cluster(spark: org.apache.spark.sql.SparkSession, t: String,
                snap: LakeTxn.Snapshot): DataFrame = {
      import org.apache.spark.sql.functions.col
      graft.ext.Zorder.zValues(
        spark.read.parquet(snap.files.map(f => s"$t/$f"): _*), col("x"), col("y"), 6)
        .repartitionByRange(8, col("zvalue"))
        .sortWithinPartitions("zvalue").drop("zvalue")
    }
  }

  test("bloom: no false negative for ANY key; skipped files never opened") {
    val t = freshDir("bloom")
    import spark.implicits._
    val docs = (0L until 600L).map(i =>
      (i, s"text $i", "en", s"src${i % 3}", 10 + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    for (r <- 0 until 3)
      LakeTxn.appendCommitBloom(spark, docs.filter(col("doc_id") % 3 === r)
        .repartition(4), t, keyCol = "doc_id")
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.size === 12)
    assert(snap.adds.forall(a => a.bloomCol == "doc_id" && a.bloom != null))

    // exhaustive no-false-negative: every present key is found
    val all = (0L until 600L).grouped(100).map { ks =>
      LakeTxn.readBloomKeys(spark, t, "doc_id", ks.toSeq)._1.count()
    }.sum
    assert(all === 600L)

    // an absent key prunes (usually everything; the one kept schema
    // carrier returns no rows through the IN filter)
    val (none, noneScan, _) = LakeTxn.readBloomKeys(spark, t, "doc_id", Seq(999999L))
    assert(none.count() === 0L)
    assert(noneScan <= 1, s"an absent key should prune everything ($noneScan)")

    // a single-key probe prunes most files — and skipped ones are
    // never touched (corrupt them, read again)
    val (one, scanned, total) = LakeTxn.readBloomKeys(spark, t, "doc_id", Seq(17L))
    assert(total === 12 && scanned < 12,
      s"a point probe must prune ($scanned of $total)")
    assert(one.count() === 1L)
    // kept = the files the reader's membership test keeps; corrupt the rest
    val keptFiles = snap.adds.filter { a =>
      val bytes = java.util.Base64.getDecoder.decode(a.bloom)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val bits = Array.fill(bytes.length / 8)(bb.getLong)
      LakeTxn.bloomBits(LakeTxn.xx64(17L))
        .forall(p => (bits(p >> 6) & (1L << (p & 63))) != 0)
    }.map(_.file).toSet
    assert(garbage(t, keptFiles) > 0)
    val (again, _, _) = LakeTxn.readBloomKeys(spark, t, "doc_id", Seq(17L))
    assert(again.collect().map(_.getLong(0)).toSeq === Seq(17L))
  }

  test("bloom on a non-BIGINT key is refused (narrower hash would false-negative)") {
    val t = freshDir("bloomint")
    import spark.implicits._
    val ints = (0 until 50).map(i => (i, s"t$i")).toDF("k", "text") // k: INT
    val e = intercept[IllegalArgumentException](
      LakeTxn.appendCommitBloom(spark, ints, t, keyCol = "k"))
    assert(e.getMessage.contains("BIGINT"))
  }

  test("bloom membership is write/read consistent and round-trips the log") {
    val t = freshDir("bloomrt")
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"t$i", "en", "s", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    LakeTxn.appendCommitBloom(spark, docs.repartition(2), t, keyCol = "doc_id")
    // a checkpoint must carry the bloom through
    LakeTxn.checkpointLog(spark, t)
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.forall(_.bloom != null))
    val (df, _, _) = LakeTxn.readBloomKeys(spark, t, "doc_id", Seq(7L, 23L))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(7L, 23L))
  }
}
