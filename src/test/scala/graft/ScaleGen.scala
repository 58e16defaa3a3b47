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
    val li = Tables.lineitem(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
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
      // lineitem copies: fresh orderkeys (the sketch-family distinct
      // domain grows linearly, as in a real growing fact table), prices
      // nudged per copy so the quantile value space grows; group columns
      // (returnflag/linestatus) and date slices UNCHANGED — bounded
      // sketch state must stay groups × capacity while rows grow
      val liCopies = (0 until copies).map { c =>
        li.select(
          (col("l_orderkey") + c.toLong * 100000000L).as("l_orderkey"),
          (col("l_partkey") + c.toLong * 100000000L).as("l_partkey"),
          col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") + lit(c * 0.07)).as("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate"))
      }
      // events copies: fresh event/user ids, timestamps jittered inside
      // the same range (copy-specific second offset — windows/sessions
      // grow in population, not in span), event_type domain UNCHANGED
      val evCopies = (0 until copies).map { c =>
        ev.select(
          (col("event_id") + c.toLong * 100000000L).as("event_id"),
          (col("ts") + expr(s"make_interval(0, 0, 0, 0, 0, 0, ${c % 7})")).as("ts"),
          (col("user_id") + c.toLong * 1000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      // orders copies (round-16, for the global-sort / sorted-write
      // rows): fresh order+cust keys, prices nudged per copy so the
      // range partitioner's sampled key space genuinely grows
      val ord = Tables.orders(spark, sfDir)
      val ordCopies = (0 until copies).map { c =>
        ord.select(
          (col("o_orderkey") + c.toLong * 100000000L).as("o_orderkey"),
          (col("o_custkey") + c.toLong * 100000000L).as("o_custkey"),
          col("o_orderstatus"),
          (col("o_totalprice") + lit(c * 0.07)).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
      }
      // customer copies (round-18, for the stats-broadcast join): cust
      // keys shifted in lockstep with the orders copies so every scaled
      // order still joins a scaled customer
      val cust = Tables.customer(spark, sfDir)
      val custCopies = (0 until copies).map { c =>
        cust.select(
          (col("c_custkey") + c.toLong * 100000000L).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment"))
      }
      def writeAll(parts: Seq[DataFrame], name: String): Unit =
        parts.reduce(_ unionByName _).repartition(4 * copies)
          .write.mode("overwrite").parquet(s"$dir/$name.parquet")
      writeAll(docCopies, "documents")
      writeAll(embCopies, "embeddings")
      writeAll(liCopies, "lineitem")
      writeAll(evCopies, "events")
      writeAll(ordCopies, "orders")
      writeAll(custCopies, "customer")
      val n = spark.read.parquet(s"$dir/documents.parquet").count()
      val ne = spark.read.parquet(s"$dir/embeddings.parquet").count()
      println(s"[scalegen] x$copies -> $dir docs=$n emb=$ne")
    }
    spark.stop()
  }
}
