package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.apps.{InvertedIndex, WordCount}
import graft.core.MapReduce

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query has a matching DuckDB oracle in [[oracleSql]] unless its
  * semantics are not SQL-expressible (approximate/sketch ops), in which
  * case the driver records a weaker rows-only check and a ScalaTest spec
  * carries the correctness argument instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.wordCount(Tables.documents(spark, "/root/testdata/sf0.001"))

  /** Shared DuckDB CTE: the canonical tokenizer (§1.4 rules) as SQL.
    * RE2 has no `(?U)` flag but supports the explicit Unicode classes. */
  private val tokSql =
    """SELECT lower(regexp_replace(t, '[^\p{L}\p{N}]+', '', 'g')) AS word,
      |       source AS doc
      |FROM documents, unnest(regexp_split_to_array(text, '\s+')) AS u(t)
      |WHERE t <> ''""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- parity: the reference's two applications ----
    "wc_word_count" -> ((s, d) => WordCount.wordCount(Tables.documents(s, d))),
    "wc_formatted" -> ((s, d) => WordCount.formatted(Tables.documents(s, d))),
    "ii_flat" -> ((s, d) => InvertedIndex.flat(Tables.documents(s, d))),
    "ii_postings" -> ((s, d) => InvertedIndex.postings(Tables.documents(s, d))),
    // ---- parity: pluggable map/reduce registry (reference's dispatch) ----
    "mr_registry_wc" -> ((s, d) =>
      MapReduce.run(Tables.documents(s, d), "map_wc", "reduce_wc")),
    "mr_registry_id_flat" -> ((s, d) =>
      MapReduce.runFlat(Tables.documents(s, d), "map_id")),
    "mr_registry_id" -> ((s, d) =>
      MapReduce.run(Tables.documents(s, d), "map_id", "reduce_id")),
    // ---- parity: multi-source union (reference's multi-file concat) ----
    "union_sources" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      WordCount.wordCount(
        docs.filter(col("source") === "src0")
          .unionByName(docs.filter(col("source") === "src1")))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "wc_word_count" ->
      s"""WITH tok AS ($tokSql)
         |SELECT word, count(*) AS cnt FROM tok GROUP BY word ORDER BY word""".stripMargin,
    "wc_formatted" ->
      s"""WITH tok AS ($tokSql)
         |SELECT word || ' - [' || count(*) || ']' AS line
         |FROM tok GROUP BY word ORDER BY word""".stripMargin,
    "ii_flat" ->
      s"""WITH tok AS ($tokSql)
         |SELECT word, doc, count(*) AS cnt FROM tok
         |GROUP BY word, doc ORDER BY word, doc""".stripMargin,
    "mr_registry_wc" ->
      s"""WITH tok AS ($tokSql)
         |SELECT word AS key, count(*) AS cnt FROM tok GROUP BY word ORDER BY key""".stripMargin,
    "mr_registry_id_flat" ->
      s"""WITH tok AS ($tokSql)
         |SELECT word AS key, doc, count(*) AS cnt FROM tok
         |GROUP BY word, doc ORDER BY key, doc""".stripMargin,
    "union_sources" ->
      s"""WITH tok AS ($tokSql)
         |SELECT word, count(*) AS cnt FROM tok
         |WHERE doc IN ('src0', 'src1') GROUP BY word ORDER BY word""".stripMargin,
  )
}
