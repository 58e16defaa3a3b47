package graft.apps

import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word count — the reference's first application (`map_wc`/`reduce_wc`,
  * reference `MapReduce.py:25-30` mapper and `MapReduce.py:42-49` reducer).
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

  /** Skew-resistant two-phase variant: pre-aggregate on (word, salt) so a
    * pathologically hot token ("the" at web scale) spreads over
    * `saltBuckets` reducers before the final combine. Results are
    * identical to [[wordCount]] — counts are associative — so it shares
    * the same oracle; only the exchange layout differs.
    *
    * The salt is derived from deterministic row content — (provenance,
    * token position) — never from a nondeterministic expression: if a map
    * output is lost and recomputed after some reducers completed, the
    * recomputed rows must route to the SAME reducers or counts double/drop
    * under stage retry. */
  def wordCountSalted(docs: DataFrame, saltBuckets: Int = 16,
                      textCol: String = "text", docCol: String = "source"): DataFrame =
    docs.select(col(docCol).as("doc"), posexplode(Tokenize.tokensArray(col(textCol))))
      .select(col("col").as("word"),
        pmod(xxhash64(col("doc"), col("pos")), lit(saltBuckets)).as("salt"))
      .groupBy("word", "salt")
      .agg(count(lit(1)).as("c1"))
      .groupBy("word")
      .agg(sum(col("c1")).as("cnt"))
      .orderBy("word")

  /** Partition-local sort (reference op 8): cluster by word, sorted runs
    * inside each partition, no global exchange beyond the clustering. */
  def clusteredSorted(docs: DataFrame): DataFrame =
    Tokenize.tokenize(docs)
      .repartition(col("word"))
      .sortWithinPartitions("word", "doc")

  /** The reference's text sink format: one line `word - [cnt]`.
    * Canonical form (totally ordered, no final-flush bug). */
  def formatted(docs: DataFrame): DataFrame =
    wordCount(docs)
      .select(format_string("%s - [%d]", col("word"), col("cnt")).as("line"))
}
