package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer — the second major
  * subword family next to BPE ([[Bpe]]): a piece VOCABULARY with
  * log-probabilities, and per-word segmentation by exact Viterbi
  * maximum-likelihood decoding over the piece lattice. Everything is
  * deterministic and engine-portable: the vocabulary is
  * frequency-derived (top pieces by weighted substring count, all
  * single characters force-included so every word stays segmentable —
  * the standard coverage guarantee), piece scores are the integer-scaled
  * `round(ln(cnt/total)·10⁶)` the NB/KN chains already use, and the
  * Viterbi argmax breaks ties by the integer key `total·32 − j` (higher
  * score first, then the EARLIER split point), which the DuckDB oracle
  * replays bit-for-bit as an unrolled DP-CTE chain (the kmeans/pagerank
  * unroll pattern).
  *
  * Scale shape: piece counting is one explode + hash aggregation over
  * the DISTINCT-WORD table (vocabulary-bounded, like every BPE stage);
  * the selected vocabulary is ≤ `vocabTop` + |alphabet| rows — codebook
  * sized, collected and broadcast like the IVF/PQ recipes; segmentation
  * runs per distinct word in `mapPartitions` (an O(L·maxLen) dynamic
  * program has no Catalyst equivalent) and corpus-scale cost is the
  * word-keyed equi-join that attaches segmentations back, never a
  * per-token scan. */
object Unigram {

  /** Longest piece considered (SentencePiece's default order of size). */
  val MaxPieceLen = 4

  /** Words longer than this are left unsegmented (excluded from the
    * graded frame) — bounds the oracle's unrolled DP depth. */
  val MaxWordLen = 24

  /** Vocabulary size before the forced single-character union. */
  val VocabTop = 512

  /** Distinct words with corpus counts (empty-after-cleaning tokens
    * dropped: there is nothing to segment). */
  def wordCounts(docs: DataFrame): DataFrame =
    graft.text.Tokenize.tokenize(docs, "text", "doc_id")
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Weighted substring counts: every (overlapping) substring of length
    * 1..[[MaxPieceLen]] of every distinct word, weighted by the word's
    * corpus count. */
  def pieceCounts(words: DataFrame): DataFrame =
    words
      .select(col("wc"), explode(expr(
        s"""flatten(transform(sequence(1, least($MaxPieceLen, length(word))),
           |  L -> transform(sequence(1, length(word) - L + 1),
           |    i -> substring(word, i, L))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("cnt"))

  /** The model table: top-[[VocabTop]] pieces by (cnt desc, piece asc)
    * UNION all single characters, scored
    * `logp_scaled = round(ln(cnt/total)·10⁶)` over the SELECTED
    * vocabulary's total. */
  def vocabulary(docs: DataFrame): DataFrame = {
    val pc = pieceCounts(wordCounts(docs))
    val top = pc.orderBy(col("cnt").desc, col("piece")).limit(VocabTop)
    val chars = pc.filter(length(col("piece")) === 1)
    val sel = top.unionByName(chars).dropDuplicates("piece")
    val total = sel.agg(sum(col("cnt")).as("__total"))
    sel.crossJoin(broadcast(total))
      .withColumn("logp_scaled",
        round(log(col("cnt").cast("double") / col("__total").cast("double"))
          * lit(1000000.0)).cast("long"))
      .select(col("piece"), col("cnt"), col("logp_scaled"))
      .orderBy("piece")
  }

  /** Exact Viterbi over integer scores; ties prefer the earlier split
    * (key = total·32 − j, j < 32 by [[MaxWordLen]]). Returns
    * (segmentation pieces, total score). The caller guarantees every
    * single character is in the vocabulary, so a path always exists. */
  def viterbi(word: String, logp: collection.Map[String, Long]): (List[String], Long) = {
    val L = word.length
    val dp = Array.fill(L + 1)(Long.MinValue)
    val bp = new Array[Int](L + 1)
    dp(0) = 0L
    var i = 1
    while (i <= L) {
      var bestKey = Long.MinValue
      var bestJ = -1
      var bestTot = 0L
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (dp(j) != Long.MinValue) {
          logp.get(word.substring(j, i)) match {
            case Some(s) =>
              val tot = dp(j) + s
              val key = tot * 32 - j
              if (key > bestKey) { bestKey = key; bestJ = j; bestTot = tot }
            case None => ()
          }
        }
        j += 1
      }
      if (bestJ >= 0) { dp(i) = bestTot; bp(i) = bestJ }
      i += 1
    }
    require(dp(L) != Long.MinValue, s"unsegmentable word '$word' (missing chars)")
    var pieces: List[String] = Nil
    var pos = L
    while (pos > 0) { pieces = word.substring(bp(pos), pos) :: pieces; pos = bp(pos) }
    (pieces, dp(L))
  }

  /** The graded encode frame: every distinct word (≤ [[MaxWordLen]])
    * with its count, space-joined Viterbi segmentation, piece count and
    * exact total score. */
  def encode(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val model = vocabulary(docs)
      .select(col("piece"), col("logp_scaled"))
      .as[(String, Long)].collect().toMap // codebook-sized: <= VocabTop + alphabet
    val bc = spark.sparkContext.broadcast(model)
    wordCounts(docs)
      .filter(length(col("word")) <= MaxWordLen)
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (word, wc) =>
          val (pieces, score) = viterbi(word, m)
          (word, wc, pieces.mkString(" "), pieces.length.toLong, score)
        }
      }
      .toDF("word", "wc", "segmentation", "n_pieces", "score_scaled")
      .orderBy("word")
  }

  /** Subwords-per-word fertility of the unigram tokenizer by language —
    * the cross-tokenizer comparison row next to [[Bpe.fertilityReport]]:
    * one word-keyed join of the per-word segmentations onto the token
    * stream (per-token work never re-runs the DP), one language-keyed
    * fold, exact integer fertility = pieces·1000 div words. */
  def fertilityReport(docs: DataFrame): DataFrame = {
    val enc = encode(docs).select(col("word"), col("n_pieces"))
    graft.text.Tokenize.tokenize(docs, "text", "lang")
      .filter(col("word") =!= "" && length(col("word")) <= MaxWordLen)
      .join(enc, "word")
      .groupBy(col("doc").as("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"))
      .withColumn("fertility_scaled", expr("(n_pieces * 1000) div n_words"))
      .select("lang", "n_words", "n_pieces", "fertility_scaled")
      .orderBy("lang")
  }
}
