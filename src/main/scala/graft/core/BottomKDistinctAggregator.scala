package graft.core

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state k-minimum-values buffer: the k smallest DISTINCT longs
  * seen, kept sorted ascending. This is the whole state of a KMV
  * ("theta") distinct sketch — the buffer never exceeds k elements, so
  * the map-side partial aggregate ships ≤ k values per (partition,
  * group) across the shuffle, and merge (fold one buffer into the
  * other) is commutative and associative: the k smallest distinct of a
  * union is determined by the per-side k-smallest sets alone, so the
  * merge is lossless by construction.
  *
  * Duplicate inputs dedup on insert (a KMV sketch is over the distinct
  * hash set); the `contains` scan and sorted insert are O(k) with
  * k ≲ 64 — constant work per row against the shuffle it replaces.
  */
final class BottomKDistinctAggregator(k: Int)
    extends Aggregator[Long, Vector[Long], Seq[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Vector[Long] = Vector.empty

  override def reduce(b: Vector[Long], a: Long): Vector[Long] =
    BottomKDistinctAggregator.insert(k)(b, a)

  override def merge(b1: Vector[Long], b2: Vector[Long]): Vector[Long] =
    BottomKDistinctAggregator.merge(k)(b1, b2)

  override def finish(r: Vector[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Vector[Long]] = ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object BottomKDistinctAggregator {

  /** The one insert every path shares — the in-engine partial aggregate
    * and the cross-micro-batch streaming fold run literally this. */
  def insert(k: Int)(b: Vector[Long], v: Long): Vector[Long] =
    if (b.length == k && v >= b.last) b
    else if (b.contains(v)) b
    else {
      val grown = (b :+ v).sorted
      if (grown.length > k) grown.take(k) else grown
    }

  def merge(k: Int)(b1: Vector[Long], b2: Vector[Long]): Vector[Long] =
    b2.foldLeft(b1)(insert(k))
}
