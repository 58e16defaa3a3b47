package graft.ext

import graft.apps.WordCount
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the step
  * that turns a cleaned corpus into the subword vocabulary a model
  * trains with (Sennrich et al. 2016).
  *
  * Scale design: the corpus is scanned ONCE, for word frequencies (the
  * same partial-agg shuffle as word count). Every merge round then runs
  * on the DISTINCT-WORD table — vocab-sized (10^5–10^6 rows at web
  * scale), orders of magnitude smaller than the token stream — so an
  * iteration costs one pair-count aggregation (weighted by word
  * frequency) plus a TakeOrdered(1) argmax, never a corpus rescan. The
  * word table is localCheckpointed per round to keep lineage flat across
  * the iteration (a cluster deployment would use a reliable checkpoint).
  *
  * Merge application is the canonical greedy left-to-right scan
  * (non-overlapping: `a a a a` + merge (a,a) → `aa aa`), expressed as a
  * sequential fold over the symbol array with a one-symbol lookback —
  * pure Column code, evaluated on the small word table only.
  *
  * The initial alphabet is restricted to `[a-z0-9]+` words: alphabet
  * control is standard BPE practice, and it pins char-splitting to a
  * range where every engine agrees (the DuckDB oracle replays the full
  * trainer — pair counts, argmax tiebreak, greedy walk — in recursive
  * SQL).
  */
object Bpe {

  /** End-of-word marker symbol (cannot collide: tokenizer output never
    * contains `_`). */
  val EndMark = "_"

  final case class Merge(rnd: Int, lhs: String, rhs: String, merged: String, cnt: Long)

  /** (word, freq, symbol-array) table: chars + end marker. */
  def initialWords(docs: DataFrame): DataFrame =
    WordCount.wordCount(docs)
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .select(col("word"), col("cnt").cast("long").as("freq"),
        concat(split(col("word"), ""), array(lit(EndMark))).as("l"))

  /** Adjacent-pair frequencies over the word table, weighted by word
    * frequency — one small shuffle per round. */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(col("freq"),
        explode(transform(slice(col("l"), lit(1), size(col("l")) - 1),
          (s, i) => struct(s.as("a"),
            element_at(col("l"), (i + lit(2)).cast("int")).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Canonical greedy merge pass: one-symbol lookback fold. `pend` holds
    * the previous unmerged symbol; a (pend=a, s=b) hit emits the merged
    * symbol and clears the lookback so a merged symbol never re-pairs
    * within the same pass. */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val zero = struct(array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("pend"))
    val step = (st: Column, s: Column) => {
      val hit = st.getField("pend") === lit(a) && s === lit(b)
      struct(
        when(hit, concat(st.getField("acc"), array(lit(a + b))))
          .otherwise(when(st.getField("pend").isNull, st.getField("acc"))
            .otherwise(concat(st.getField("acc"), array(st.getField("pend")))))
          .as("acc"),
        when(hit, lit(null).cast("string")).otherwise(s).as("pend"))
    }
    val finish = (st: Column) =>
      when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("pend"))))
    aggregate(syms, zero, step, finish)
  }

  /** Run `rounds` merge rounds; returns the learned merges and the word
    * table in its final segmentation. Ties break on (count desc, lhs,
    * rhs) — fully deterministic. */
  def train(docs: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, "need at least one merge round")
    var words = initialWords(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, cnt) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += Merge(r, a, b, a + b, cnt)
        words = words.withColumn("l", applyMerge(col("l"), a, b)).localCheckpoint(true)
      }
      r += 1
    }
    (merges.toSeq, words)
  }

  /** The learned merge table — the trainer's user-facing artifact. */
  def mergeTable(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (m, _) = train(docs, rounds)
    m.toDF().orderBy("rnd")
  }

  /** Corpus-level subword frequencies after training: each word's final
    * segmentation weighted by its frequency — the vocabulary-coverage
    * report (and the lookup table an encoder would broadcast: encoding a
    * 100 TB token stream is a join against this vocab-sized table, not a
    * re-derivation per token). */
  def subwordFrequencies(docs: DataFrame, rounds: Int): DataFrame = {
    val (_, words) = train(docs, rounds)
    words.select(explode(col("l")).as("subword"), col("freq"))
      .groupBy("subword").agg(sum(col("freq")).as("n"))
      .orderBy("subword")
  }
}
