package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** The n-column stats map in the commit log: per-file min/max AND
  * nullCount for any number of columns, pruning IS (NOT) NULL and band
  * predicates from the log alone — zero footer opens (corruption-
  * proof), checkpoint round-trip included. */
class LakeMultiStatsSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lms_${name}_${System.nanoTime()}"

  /** k-banded rows: `v` is null for k < 40 (the first two band files),
    * INT64 everywhere; layout range-partitions on k so bands are tight
    * and nullness clusters by file. */
  private def banded(): DataFrame = {
    import spark.implicits._
    (0L until 80L).map(i =>
      (i, if (i < 40) None else Some(i * 10), s"t$i"))
      .toDF("k", "v", "text")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
  }

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

  test("sx records [min,max,nullCount] per column; checkpoint round-trips") {
    val t = freshDir("rt")
    LakeTxn.appendCommitStatsMulti(spark, banded(), t, Seq("k", "v", "text"))
    val snap = LakeTxn.snapshot(spark, t)
    assert(snap.adds.size === 4)
    val maps = snap.adds.map(a => LakeTxn.decodeSx(a.sx))
    // every file carries all three columns; k bands are disjoint and tight
    assert(maps.forall(_.keySet === Set("k", "v", "text")))
    val kBands = maps.map(_("k")).sortBy(_._1)
    assert(kBands.map { case (lo, hi, _) => (lo, hi) }.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => h1 < l2
      case _ => true
    })
    // nullCounts: v all-null in low-k files, zero-null in high-k files
    val byLoK = snap.adds.map(a => LakeTxn.decodeSx(a.sx))
      .sortBy(_("k")._1)
    assert(byLoK.head("v")._3 > 0L) // low-k file: v all-null
    assert(byLoK.last("v")._3 === 0L) // high-k file: no nulls
    // an all-null column carries the no-band sentinel
    assert { val (lo, hi, _) = byLoK.head("v"); lo > hi }
    // text (BINARY) has the no-band sentinel but a real nullCount
    assert(maps.forall { m => val (lo, hi, nn) = m("text"); lo > hi && nn == 0L })
    // a checkpointed fold carries the map through
    LakeTxn.checkpointLog(spark, t)
    LakeTxn.appendCommit(spark, banded().limit(1), t)
    val after = LakeTxn.snapshot(spark, t)
    assert(after.adds.count(_.sx != null) === 4)
    assert(after.adds.filter(_.sx != null).map(a => LakeTxn.decodeSx(a.sx)).toSet
      === maps.toSet)
  }

  test("IS NOT NULL prunes all-null files; IS NULL prunes no-null files; never opened") {
    val t = freshDir("nulls")
    LakeTxn.appendCommitStatsMulti(spark, banded(), t, Seq("k", "v"))
    val snap = LakeTxn.snapshot(spark, t)
    val sch = spark.read.format("graft-lake").load(t).schema
    // IS NOT NULL: keep only files with a non-null v
    val keepNotNull = snap.adds.filter { a =>
      val (_, _, nn) = LakeTxn.decodeSx(a.sx)("v")
      nn == -1L || nn < a.rows
    }.map(_.file).toSet
    assert(keepNotNull.size < snap.adds.size, "all-null files must prune")
    assert(garbage(t, keepNotNull) > 0)
    val notNull = spark.read.format("graft-lake").schema(sch).load(t)
      .filter(col("v").isNotNull)
    assert(notNull.count() === 40L)
    assert(notNull.agg(sum("v")).head.getLong(0) === (40L until 80L).map(_ * 10).sum)

    // fresh table for the IS NULL direction (files above were corrupted)
    val t2 = freshDir("nulls2")
    LakeTxn.appendCommitStatsMulti(spark, banded(), t2, Seq("k", "v"))
    val snap2 = LakeTxn.snapshot(spark, t2)
    val keepNull = snap2.adds.filter(a => LakeTxn.decodeSx(a.sx)("v")._3 != 0L)
      .map(_.file).toSet
    assert(keepNull.size < snap2.adds.size, "zero-null files must prune")
    assert(garbage(t2, keepNull) > 0)
    assert(spark.read.format("graft-lake").schema(sch).load(t2)
      .filter(col("v").isNull).count() === 40L)
  }

  test("a band on a SECOND stats-map column prunes with zero footer opens") {
    val t = freshDir("band2")
    LakeTxn.appendCommitStatsMulti(spark, banded(), t, Seq("k", "v"))
    val snap = LakeTxn.snapshot(spark, t)
    val sch = spark.read.format("graft-lake").load(t).schema
    // v in [500, 600]: only files whose v band overlaps survive
    val keep = snap.adds.filter { a =>
      val (lo, hi, _) = LakeTxn.decodeSx(a.sx)("v")
      lo <= hi && hi >= 500L && lo <= 600L
    }.map(_.file).toSet
    assert(keep.nonEmpty && keep.size < snap.adds.size)
    assert(garbage(t, keep) > 0)
    val got = spark.read.format("graft-lake").schema(sch).load(t)
      .filter(col("v").between(500L, 600L))
    assert(got.collect().map(_.getLong(0)).sorted.toSeq === (50L to 60L))
  }

  test("unknown columns and stat-less files admit conservatively") {
    val t = freshDir("cons")
    // one stats-mapped append + one plain append (no sx)
    LakeTxn.appendCommitStatsMulti(spark, banded(), t, Seq("k", "v"))
    LakeTxn.appendCommit(spark, banded().limit(10).repartition(1), t)
    val got = spark.read.format("graft-lake").load(t)
      .filter(col("v").isNotNull && col("text") =!= "zzz")
    // plain files are kept (conservative), results stay exact
    assert(got.count() === 40L + 0L + banded().limit(10)
      .filter(col("v").isNotNull).count())
  }
}
