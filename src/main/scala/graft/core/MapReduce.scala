package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Generalized map/shuffle/reduce combinator — the idiomatic Spark analogue
  * of the reference's string-keyed `MAPPER_FUNCTIONS` / `REDUCER_FUNCTIONS`
  * registries (survey of `MapReduce.py:51-52`).
  *
  * A *mapper* turns an input DataFrame into `(key: string, value columns…)`
  * rows (the reference's `map_fn(k, v) -> [word, [doc, 1]]`). A *reducer* is
  * a set of named aggregate columns applied after `groupBy(key)` (the
  * reference's streaming `reduce_fn` over a sorted run — Catalyst picks
  * hash aggregation with a map-side partial; semantics identical, and the
  * shuffle is a distributed hash exchange rather than the reference's
  * single-node centralized partition step).
  *
  * Because both sides are declarative Column expressions, jobs composed
  * through the registry still get whole-stage codegen, partial aggregation
  * and AQE — there is no opaque lambda in the hot path.
  */
object MapReduce {

  /** Emits (key, …value columns) rows from the input. */
  final case class Mapper(apply: DataFrame => DataFrame)

  /** Aggregates the value columns of one key group; optional post-grouping
    * projection (e.g. to pack a map type). */
  final case class Reducer(aggs: Seq[Column], post: DataFrame => DataFrame = identity)

  private val mappers  = TrieMap.empty[String, Mapper]
  private val reducers = TrieMap.empty[String, Reducer]

  def registerMapper(name: String, m: Mapper): Unit  = mappers.put(name, m)
  def registerReducer(name: String, r: Reducer): Unit = reducers.put(name, r)
  def mapperNames: Set[String]  = mappers.keySet.toSet
  def reducerNames: Set[String] = reducers.keySet.toSet

  /** Run a registered (mapper, reducer) pair — the analogue of
    * `GET /run_mapred/<files>/<map_num>/<reducers>/<map_fn>/<reduce_fn>`.
    * Key column must be named `key` in the mapper output.
    *
    * `mapParallelism`/`reduceParallelism` mirror the reference's
    * map_num/reduce_num knobs: map-side input splits and reduce-side
    * shuffle partitions. 0 (default) leaves both to Catalyst/AQE, which
    * is the right call except in benchmarking experiments. */
  def run(input: DataFrame, mapFn: String, reduceFn: String,
          mapParallelism: Int = 0, reduceParallelism: Int = 0): DataFrame = {
    val m = mappers.getOrElse(mapFn, sys.error(s"unknown mapper: $mapFn"))
    val r = reducers.getOrElse(reduceFn, sys.error(s"unknown reducer: $reduceFn"))
    val in = if (mapParallelism > 0) input.repartition(mapParallelism) else input
    val mapped = m.apply(in)
    val grouped =
      if (reduceParallelism > 0)
        mapped.repartition(reduceParallelism, col("key")).groupBy("key")
      else mapped.groupBy("key")
    r.post(grouped.agg(r.aggs.head, r.aggs.tail: _*)).orderBy("key")
  }

  // ---- the reference's two shipped applications, expressed on the registry

  import graft.text.Tokenize

  /** map_wc / map_id: tokenize, tag with provenance, constant 1. */
  private val tokenizeMapper = Mapper { docs =>
    Tokenize.tokenize(docs)
      .select(col("word").as("key"), col("doc"), lit(1L).as("cnt"))
  }

  registerMapper("map_wc", tokenizeMapper)
  registerMapper("map_id", tokenizeMapper)

  /** reduce_wc: total count per word (doc ignored). */
  registerReducer("reduce_wc", Reducer(Seq(sum(col("cnt")).as("cnt"))))

  /** reduce_id: {doc: count} postings map per word, canonically doc-sorted —
    * a typed Aggregator with map-side partial merge (see PostingsAggregator). */
  private val postingsUdaf =
    udaf(PostingsAggregator, org.apache.spark.sql.Encoders.product[DocCnt])

  registerReducer("reduce_id", Reducer(
    aggs = Seq(postingsUdaf(col("doc"), col("cnt")).as("postings"))))

  /** reduce_id_flat: (key, doc, cnt) — oracle-checkable flattened postings.
    * Grouping on both key and doc happens in the mapper contract instead:
    * use `runFlat`. */
  def runFlat(input: DataFrame, mapFn: String): DataFrame = {
    val m = mappers.getOrElse(mapFn, sys.error(s"unknown mapper: $mapFn"))
    m.apply(input)
      .groupBy("key", "doc").agg(sum(col("cnt")).as("cnt"))
      .orderBy("key", "doc")
  }
}
