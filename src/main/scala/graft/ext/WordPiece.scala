package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (BERT lineage) — the THIRD subword family next
  * to BPE ([[Bpe]]) and unigram-LM ([[Unigram]]), and the one whose
  * segmentation rule is GREEDY, not optimal: at each position take the
  * LONGEST vocabulary piece that matches (word-initial pieces plain,
  * mid-word pieces in their `##` continuation form) and advance; if no
  * piece matches at some position, the WHOLE word becomes `[UNK]` —
  * the defining all-or-nothing degradation BERT tokenizers exhibit.
  * Greedy differs observably from [[Unigram.viterbi]]: it can pick a
  * long first piece that strands the tail (a spec pins such a case),
  * which is exactly why the two families are worth grading separately.
  *
  * The vocabulary is frequency-derived and deterministic like the
  * unigram model's: word-initial candidates are word PREFIXES,
  * continuation candidates are substrings starting at position ≥ 2,
  * both weighted by word count; top-[[InitTop]]/[[ContTop]] by
  * (cnt desc, piece asc), with all single-character INITIAL pieces
  * force-included (the first greedy step never dead-ends) but NO
  * forced continuation singles — the `[UNK]` path stays reachable,
  * as in real WordPiece vocabularies with bounded character coverage.
  *
  * Scale shape: identical to [[Unigram]] — piece counting is one
  * explode + hash aggregation over the DISTINCT-WORD table, the
  * selected vocabulary is codebook-sized (collected + broadcast), the
  * greedy scan runs per distinct word in `mapPartitions`, and
  * corpus-scale cost is only the word-keyed equi-join attaching
  * segmentations back. The DuckDB oracle replays the greedy walk as a
  * precomputed best-piece-per-(word, position) table + an unrolled
  * step chain (the unigram Viterbi unroll pattern). */
object WordPiece {

  val MaxPieceLen = 4
  /** Words longer than this are excluded from the graded frame —
    * bounds the oracle's unrolled walk depth (same as [[Unigram]]). */
  val MaxWordLen = 24
  val InitTop = 256
  val ContTop = 256
  val Unk = "[UNK]"

  /** Every substring of length 1..[[MaxPieceLen]] of every distinct
    * word with its start position, weighted by word count. */
  private def pieceRows(words: DataFrame): DataFrame =
    words.select(col("wc"), explode(expr(
        s"""flatten(transform(sequence(1, least($MaxPieceLen, length(word))),
           |  L -> transform(sequence(1, length(word) - L + 1),
           |    i -> named_struct('pos', i, 'sub', substring(word, i, L)))))""".stripMargin))
        .as("s"))
      .select(col("wc"), (col("s.pos") >= 2).as("is_cont"), col("s.sub").as("sub"))

  /** The model table: (piece, cnt, is_continuation) — continuation
    * pieces carry their `##` wire form. */
  def vocabulary(docs: DataFrame): DataFrame = {
    val pieces = pieceRows(Unigram.wordCounts(docs))
      .groupBy(col("is_cont"), col("sub")).agg(sum(col("wc")).as("cnt"))
    val init = pieces.filter(!col("is_cont"))
    val initSel = init.orderBy(col("cnt").desc, col("sub")).limit(InitTop)
      .unionByName(init.filter(length(col("sub")) === 1))
      .dropDuplicates("sub")
    val contSel = pieces.filter(col("is_cont"))
      .orderBy(col("cnt").desc, col("sub")).limit(ContTop)
    initSel.select(col("sub").as("piece"), col("cnt"),
        lit(false).as("is_continuation"))
      .unionByName(contSel.select(concat(lit("##"), col("sub")).as("piece"),
        col("cnt"), lit(true).as("is_continuation")))
      .orderBy("piece")
  }

  /** Greedy longest-match-first over the wire-form vocabulary; None =
    * some position had no match at any length → the word is `[UNK]`. */
  def greedy(word: String, vocab: Set[String]): Option[List[String]] = {
    val L = word.length
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = 0
    while (pos < L) {
      var l = math.min(MaxPieceLen, L - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val form =
          if (pos == 0) word.substring(0, l)
          else "##" + word.substring(pos, pos + l)
        if (vocab.contains(form)) hit = form else l -= 1
      }
      if (hit == null) return None
      out += hit
      pos += l
    }
    Some(out.toList)
  }

  /** The graded encode frame: every distinct word (≤ [[MaxWordLen]])
    * with its count, space-joined greedy segmentation in wire form (or
    * `[UNK]`), piece count, and the unk flag. */
  def encode(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = vocabulary(docs)
      .select(col("piece")).as[String].collect().toSet // codebook-sized
    val bc = spark.sparkContext.broadcast(vocab)
    Unigram.wordCounts(docs)
      .filter(length(col("word")) <= MaxWordLen)
      .as[(String, Long)]
      .mapPartitions { it =>
        val v = bc.value
        it.map { case (word, wc) =>
          greedy(word, v) match {
            case Some(ps) => (word, wc, ps.mkString(" "), ps.length.toLong, false)
            case None => (word, wc, Unk, 1L, true)
          }
        }
      }
      .toDF("word", "wc", "segmentation", "n_pieces", "is_unk")
      .orderBy("word")
  }

  /** Subwords-per-word fertility by language — the third row of the
    * cross-tokenizer comparison next to [[Bpe.fertilityReport]] and
    * [[Unigram.fertilityReport]]; an `[UNK]` word contributes 1 (the
    * single token it becomes). One word-keyed join onto the token
    * stream — per-token work never re-runs the greedy scan. */
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
