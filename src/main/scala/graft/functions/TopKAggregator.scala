package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF: per-group top-k (payload, rankValue) pairs in ONE aggregation
  * pass — the `Aggregator[IN, BUF, OUT]` extension point (SURVEY.md §2.2 UDAF
  * row) doing something the built-ins can't do as cheaply: the window-rank
  * formulation (q16) sorts every row of every group; this keeps a bounded
  * k-element buffer per group through partial aggregation, so shuffled bytes
  * are O(groups × k), not O(rows) — the difference that matters when a group
  * has a billion rows and k is 3.
  *
  * Determinism: ties on rankValue are broken by payload, so the result is a
  * total order regardless of partitioning.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (v, id) => (-v, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
