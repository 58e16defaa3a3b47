package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate. */
final case class Scored(score: Double, id: Long)

/** Bounded-state top-k aggregator: the buffer never holds more than k
  * elements, so the map-side partial aggregate ships ≤ k rows per
  * (partition, group) across the shuffle — the difference between a
  * window-rank top-k (shuffles every scored row) and a scalable one at
  * |corpus| × |queries| row counts.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `row_number over (order by score desc, id)` formulation, so results are
  * interchangeable with the window version (and with the SQL oracle).
  */
final class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def insert(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size == k && (a.score < b.last.score ||
        (a.score == b.last.score && a.id > b.last.id))) b
    else ((b :+ a).sortBy(s => (-s.score, s.id))).take(k)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = insert(b, a)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    b2.foldLeft(b1)(insert)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
}
