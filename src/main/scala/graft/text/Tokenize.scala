package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonical tokenizer of the engine.
  *
  * Semantics (parity with the reference pipeline, `master.py:55-64` in
  * /root/reference):
  *   1. split the document text on runs of whitespace, no empty tokens
  *      produced by the split itself. The split class is Java `\s`
  *      (space, \t, \n, \x0B, \f, \r) — Python `str.split()` parity
  *      therefore holds for ASCII-whitespace corpora (which all reference
  *      corpora and goldens are). Unicode-only whitespace (NBSP, U+2028,
  *      \x1c-\x1f, …) is intentionally NOT split on, so the engine
  *      kernel, the declarative spec and the DuckDB oracle all agree on
  *      one explicit character class;
  *   2. lowercase each token;
  *   3. delete every character that is not a Unicode letter or digit
  *      (Python `re.sub('[\\W_]+', '')` with Unicode `\\W`; Java needs an
  *      explicit `[^\p{L}\p{N}]` class — plain `\\W` is ASCII-only);
  *   4. tokens that become empty ("--" etc.) are KEPT as "" rows — the
  *      reference counts them.
  *
  * Everything is a Catalyst column expression (codegen'd, no UDF), so
  * predicate pushdown / column pruning / whole-stage codegen all apply.
  */
object Tokenize {

  /** Character class deleted from every token (complement of letter|digit). */
  val DeleteClass: String = "[^\\p{L}\\p{N}]+"

  /** Normalize one already-split token: lowercase, strip non-alphanumerics. */
  def normalize(tok: Column): Column =
    regexp_replace(lower(tok), DeleteClass, "")

  /** The declarative (higher-order-function) formulation — the executable
    * SPEC of the tokenizer, mirrored by the DuckDB oracle. Interpreted
    * per row, so the hot path below compiles the same semantics instead;
    * FunctionsSpec pins their equivalence. */
  def tokensArraySpec(text: Column): Column =
    transform(
      filter(split(text, "\\s+"), t => length(t) > 0),
      t => normalize(t))

  /** text -> array<string> of normalized tokens (empty tokens kept) —
    * codegen'd single-pass kernel. */
  def tokensArray(text: Column): Column =
    graft.functions.tokenize_text(text)

  /** Explode a document table into one row per token.
    *
    * @param docs    any DataFrame with a text column and a provenance column
    * @param textCol name of the text column
    * @param docCol  name of the provenance column (plays the reference's
    *                "originating filename" role)
    * @return DataFrame(word STRING, doc STRING)
    */
  def tokenize(docs: DataFrame, textCol: String = "text", docCol: String = "source"): DataFrame =
    docs.select(
      explode(tokensArray(col(textCol))).as("word"),
      col(docCol).as("doc"))
}
