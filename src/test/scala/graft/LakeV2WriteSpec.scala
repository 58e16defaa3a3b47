package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.LakeTxn

/** The V2 WRITE path: `df.write.format("graft-lake").mode("append")`
  * stages per task and publishes ONE atomic log commit per write —
  * with the lake's CHECK constraints and writer protocol gate applied,
  * and a clean abort (violations leave no staged files and no new
  * version). */
class LakeV2WriteSpec extends SparkSpec {

  private def freshDir(name: String): String =
    s"/tmp/graft_lv2w_${name}_${System.nanoTime()}"

  private def mkDocs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"text $i", "en", s"src${i % 3}", (10 + i).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("a connector write is one atomic commit; content round-trips exactly") {
    val t = freshDir("append")
    LakeTxn.appendCommit(spark, mkDocs(0 until 20).repartition(2), t)
    mkDocs(20 until 50).repartition(3)
      .write.format("graft-lake").mode("append").save(t)
    // exactly one new version for the whole 3-task write
    assert(LakeTxn.listVersions(spark, t) === Seq(0L, 1L))
    val want = mkDocs(0 until 50).orderBy("doc_id").collect().map(_.mkString("|"))
    assert(LakeTxn.read(spark, t).orderBy("doc_id")
      .collect().map(_.mkString("|")) === want)
    // and back through the connector's read half
    assert(spark.read.format("graft-lake").load(t).count() === 50L)
    // the stage dir is gone
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(t))
      .filter(p => p.getFileName.toString.startsWith(".stage-v2w")).count() === 0L)
  }

  test("a constraint-violating connector write aborts: no version, no staged leftovers") {
    val t = freshDir("constraint")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    LakeTxn.addConstraint(spark, t, "pos", "n_chars >= 0")
    val vBefore = LakeTxn.listVersions(spark, t)
    val e = intercept[Exception](
      mkDocs(10 until 20).withColumn("n_chars", lit(-1L)).repartition(1)
        .write.format("graft-lake").mode("append").save(t))
    assert(e.getMessage.contains("CHECK constraint") ||
      Option(e.getCause).exists(_.getMessage.contains("CHECK constraint")))
    assert(LakeTxn.listVersions(spark, t) === vBefore)
    assert(LakeTxn.read(spark, t).count() === 10L)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(t))
      .filter(p => p.getFileName.toString.startsWith(".stage-v2w")).count() === 0L)
  }

  test("the writer protocol gate blocks connector writes") {
    val t = freshDir("proto")
    LakeTxn.appendCommit(spark, mkDocs(0 until 10).repartition(1), t)
    LakeTxn.setProtocol(spark, t, reader = 1, writer = 99)
    val e = intercept[Exception](
      mkDocs(10 until 20).repartition(1)
        .write.format("graft-lake").mode("append").save(t))
    assert(e.getMessage.contains("writer protocol") ||
      Option(e.getCause).exists(_.getMessage.contains("writer protocol")))
    assert(LakeTxn.read(spark, t).count() === 10L)
  }

  test("the full atomic-type surface round-trips through write and read") {
    val t = freshDir("types")
    import spark.implicits._
    val d = (0 until 20).map { i =>
      (i.toLong, i, i.toShort, i.toByte, i * 1.5, i * 0.5f, i % 2 == 0,
        s"s$i", Array[Byte](i.toByte, (i + 1).toByte),
        java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"))
    }.toDF("l", "i", "sh", "b", "d", "f", "bool", "s", "bin", "dt")
    LakeTxn.appendCommit(spark, d.limit(1), t) // bootstrap pins the schema
    d.filter(col("l") >= 1).repartition(2)
      .write.format("graft-lake").mode("append").save(t)
    val got = LakeTxn.read(spark, t).orderBy("l").collect()
    val want = d.orderBy("l").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      (0 until w.length).foreach { k =>
        (g.get(k), w.get(k)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq === b.toSeq)
          case (a, b) => assert(a === b, s"column $k")
        }
      }
    }
  }
}
