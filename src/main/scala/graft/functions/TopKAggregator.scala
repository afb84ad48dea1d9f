package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed `Aggregator` computing the top-k (id, value) pairs per group —
  * the custom-UDAF surface (SURVEY §2k) with a genuine scale story: each
  * partition keeps only a k-bounded buffer (partial aggregation), so a
  * grouped top-k costs one shuffle of k rows per group instead of a full
  * sort of the group. Ordering is (value desc, id asc) — fully
  * deterministic under any merge order because the comparison is total.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(String, Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def top(items: Seq[(Long, Double)]): Seq[(Long, Double)] =
    items.sortBy { case (id, v) => (-v, id) }.take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)],
      in: (String, Long, Double)): Seq[(Long, Double)] =
    top(buf :+ ((in._2, in._3)))

  override def merge(b1: Seq[(Long, Double)],
      b2: Seq[(Long, Double)]): Seq[(Long, Double)] = top(b1 ++ b2)

  override def finish(reduction: Seq[(Long, Double)]): Seq[(Long, Double)] =
    reduction

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
