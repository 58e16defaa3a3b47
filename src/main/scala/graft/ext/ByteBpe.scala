package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BYTE-LEVEL BPE — the fourth production subword family (GPT-2/GPT-3
  * lineage) next to character BPE, unigram-LM, and WordPiece. The
  * defining move: the initial alphabet is the word's UTF-8 BYTES, not
  * its characters, so (a) there is no out-of-alphabet symbol — every
  * string tokenizes — and (b) a multi-byte character starts life SPLIT
  * ACROSS symbols (é = c3 + a9) and only becomes one token if the data
  * earns the merge. GPT-2 maps bytes to printable unicode; here bytes
  * render as two-digit lowercase hex, which keeps every symbol inside
  * the `[a-z0-9_]+` universe the shared merge machinery's pair-key
  * separator contract requires — same trainer, same greedy disjoint
  * batches, same encode join ([[Bpe]] internals, entered via
  * `trainFrom`).
  *
  * The graded corpus is salted with accented words (protégé, cafés,
  * naïve) so the multi-byte path is live: their é/ï arrive as real
  * two-symbol (c3, a9)/(c3, af) splits in every document.
  *
  * Scale shape: identical to [[Bpe]] — ceil(merges/batch) scans of the
  * distinct-word table to train, then ONE equi-join of the corpus token
  * stream against the vocab-sized segmentation table. */
object ByteBpe {

  /** The multi-byte salt (mirrored by the oracle's `||` literal). */
  val Salt = " protégé cafés naïve"

  /** Trainer/encoder word universe: lowercase ASCII alphanumerics plus
    * the salt's accented letters (the tokenizer keeps `\p{L}`, so the
    * accents survive into the word stream). Mirrored verbatim by the
    * oracle regex. */
  val WordRe = "^[a-z0-9éï]+$"

  def saltedDocs(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(col("text"), lit(Salt)))

  /** The word's UTF-8 bytes as two-digit lowercase hex symbols. */
  def byteSymbols(word: Column): Column =
    expr("transform(sequence(1, octet_length(word)), " +
      "i -> lower(substring(hex(encode(word, 'utf-8')), 2 * i - 1, 2)))")

  /** (word, freq, byte-symbol-array + end mark) over the salted corpus. */
  def initialWords(docs: DataFrame): DataFrame =
    graft.apps.WordCount.wordCount(docs)
      .filter(col("word").rlike(WordRe))
      .select(col("word"), col("cnt").cast("long").as("freq"),
        concat(byteSymbols(col("word")), array(lit(Bpe.EndMark))).as("l"))

  /** Graded query: byte-level train + encode over the salted corpus —
    * same output shape as `text_bpe_encode` (doc_id, n_tokens,
    * n_subwords, segmented), the segments now hex byte runs. */
  def encodeCorpus(docs: DataFrame, merges: Int,
                   batch: Int = Bpe.DefaultBatch): DataFrame = {
    val salted = saltedDocs(docs)
    val (_, words) = Bpe.trainFrom(initialWords(salted), merges, batch)
    Bpe.encodeSegmented(salted, words, WordRe)
  }

  /** Graded query: LOSSLESSNESS of the whole byte pipeline — the
    * encoded stream decodes back to the exact in-universe token stream.
    * Reconstruction is pure column work: strip the spaces (symbol
    * boundaries are not byte boundaries once merged), split on the end
    * marks, hex-decode each word's byte run, rejoin. Any fault anywhere
    * in tokenize → byte-split → merge → encode-join → order-recovery
    * breaks the equality. */
  def decodeCorpus(docs: DataFrame, merges: Int,
                   batch: Int = Bpe.DefaultBatch): DataFrame =
    encodeCorpus(docs, merges, batch)
      .select(col("doc_id"),
        array_join(
          transform(
            filter(split(regexp_replace(col("segmented"), " ", ""),
              Bpe.EndMark), h => h =!= ""),
            h => decode(unhex(h), "UTF-8")),
          " ").as("decoded"))
      .orderBy("doc_id")

  /** GPT-2-style category-aware PRE-tokenizer pattern, in the
    * lookahead-free form both Java regex (Spark) and RE2 (the DuckDB
    * oracle) execute identically: contraction suffixes first, then
    * letter runs / number runs / punctuation runs each absorbing ONE
    * leading space, then whitespace runs. The upstream GPT-2 pattern's
    * final `\s+(?!\S)` branch needs lookahead (not in RE2); dropping it
    * only changes where a MULTI-space run splits (all spaces stay one
    * token here instead of donating the last to the next word) — a
    * divergence the spec pins explicitly. Whitespace is the explicit
    * `[ \t\n\x0B\f\r]` class because Java's `\s` includes \x0B and
    * RE2's does not — the one place the two engines' shorthands
    * disagree. */
  val PretokRe: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+"

  /** All pretokens of `text`, in order, spaces preserved (a leading
    * space is PART of the token — the GPT-lineage convention that makes
    * byte-BPE lossless without a separate whitespace channel).
    * Codegen'd `regexp_extract_all`, no UDF. */
  def pretokenize(text: Column): Column =
    regexp_extract_all(text, lit(PretokRe), lit(0))

  /** Graded query: the pre-tokenizer stream itself — (doc_id, pt_no,
    * pretoken) with exact leading-space bytes, against the same RE2
    * pattern run by DuckDB. */
  def pretokCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(pretokenize(col("text"))).as(Seq("pt_no", "pretoken")))
      .select(col("doc_id"), col("pt_no").cast("long").as("pt_no"),
        col("pretoken"))
      .orderBy("doc_id", "pt_no")

  /** The learned merge table over the salted corpus (byte symbols). */
  def mergeTable(docs: DataFrame, merges: Int,
                 batch: Int = Bpe.DefaultBatch): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (m, trainedWords) = Bpe.trainFrom(initialWords(saltedDocs(docs)), merges, batch)
    org.apache.spark.sql.graft.bridge.freeCheckpoint(trainedWords)
    m.toDF().orderBy("rnd")
  }
}
