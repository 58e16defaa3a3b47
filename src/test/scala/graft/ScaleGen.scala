package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: deterministically upscale the sf0.1 documents/embeddings
  * tables by replication-with-perturbation, for scaling-curve
  * measurement (SCALING.md). NOT test data for correctness — timing only.
  *
  * Design constraints so the upscaled WORKLOAD scales like a real corpus:
  *  - each copy's text goes through a copy-specific character permutation
  *    (vowels+st rotated), so shingle sets differ across copies and the
  *    near-dup pair count grows ~linearly with the scale factor (naive
  *    replication would grow it quadratically in the copy count — clique
  *    blowup a real 10x corpus does not have);
  *  - the WITHIN-copy duplicate structure of sf0.1 is preserved exactly
  *    (a planted near-dup pair stays a near-dup pair under any character
  *    permutation);
  *  - embeddings get a copy-specific deterministic perturbation, so new
  *    vectors are distinct but the neighborhood structure per copy is
  *    preserved;
  *  - output file count grows with the scale factor (4 per copy), so
  *    bytes-per-file — and scan parallelism per byte — stays constant,
  *    as it would in a real growing lake.
  *
  * args: outRoot copies... (e.g. /tmp/graft_scale 1 3 10)
  */
object ScaleGen {
  private val Alphabet = "aeioust"

  def main(args: Array[String]): Unit = {
    val outRoot = args.head
    val copiesList = args.tail.map(_.toInt)
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    for (copies <- copiesList) {
      val dir = s"$outRoot/x$copies"
      val docCopies = (0 until copies).map { c =>
        val rot = Alphabet.drop(c % Alphabet.length) + Alphabet.take(c % Alphabet.length)
        docs.select(
          (col("doc_id") + c.toLong * 100000000L).as("doc_id"),
          (if (c == 0) col("text") else translate(col("text"), Alphabet, rot)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      val embCopies = (0 until copies).map { c =>
        emb.select(
          (col("vec_id") + c.toLong * 100000000L).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> cast(x + $c * 0.0011 * ((i % 7) - 3) as float))")
            .as("embedding"),
          col("label"))
      }
      def writeAll(parts: Seq[DataFrame], name: String): Unit =
        parts.reduce(_ unionByName _).repartition(4 * copies)
          .write.mode("overwrite").parquet(s"$dir/$name.parquet")
      writeAll(docCopies, "documents")
      writeAll(embCopies, "embeddings")
      val n = spark.read.parquet(s"$dir/documents.parquet").count()
      val ne = spark.read.parquet(s"$dir/embeddings.parquet").count()
      println(s"[scalegen] x$copies -> $dir docs=$n emb=$ne")
    }
    spark.stop()
  }
}
