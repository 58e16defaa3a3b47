package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.immutable.ListMap

/** One (doc, cnt) observation for a single word. */
final case class DocCnt(doc: String, cnt: Long)

/** Typed aggregator building `{doc -> count}` postings for one word — the
  * engine's analogue of the reference's streaming `reduce_id` fold (survey
  * of `MapReduce.py:32-41`), upgraded with what the reference lacked:
  * `merge` gives Spark a map-side partial aggregate, so raw per-token rows
  * never cross the shuffle — only per-partition partial maps do.
  *
  * `finish` canonicalizes postings in doc order (the reference emitted
  * nondeterministic dict insertion order).
  */
object PostingsAggregator extends Aggregator[DocCnt, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: DocCnt): Map[String, Long] =
    b.updated(a.doc, b.getOrElse(a.doc, 0L) + a.cnt)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    b2.foldLeft(b1) { case (acc, (d, c)) => acc.updated(d, acc.getOrElse(d, 0L) + c) }

  override def finish(r: Map[String, Long]): Map[String, Long] =
    ListMap(r.toSeq.sortBy(_._1): _*)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    bufferEncoder
}
