package graft.apps

import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word count — the reference's first application (`map_wc`/`reduce_wc`).
  *
  * One declarative plan: tokenize -> groupBy(word) -> count. Catalyst
  * inserts the partial (map-side) aggregate before the exchange, which the
  * reference lacked (it shuffled every raw `(word, 1)` pair); at 100 TB the
  * partial agg is what keeps the shuffle proportional to |vocabulary| per
  * partition instead of |tokens|.
  */
object WordCount {

  /** (word, cnt) totals over the whole corpus, ordered by word. */
  def wordCount(docs: DataFrame, textCol: String = "text", docCol: String = "source"): DataFrame =
    Tokenize.tokenize(docs, textCol, docCol)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** The reference's text sink format: one line `word - [cnt]`.
    * Canonical form (totally ordered, no final-flush bug). */
  def formatted(docs: DataFrame): DataFrame =
    wordCount(docs)
      .select(format_string("%s - [%d]", col("word"), col("cnt")).as("line"))
}
