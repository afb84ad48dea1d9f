package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed `Aggregator` keeping the k SMALLEST (rankKey, id) pairs per group,
  * carrying one payload column — the [[TopKAggregator]] shape pointed the
  * other way, built for exact-k stratified sampling (c11's production
  * path): each partition holds a k-bounded buffer, so the per-stratum
  * selection costs one shuffle of ≤k rows per (stratum, partition) instead
  * of a full per-stratum sort. Ordering (rankKey asc, id asc) is total, so
  * the result is identical under any partial-merge order — the same
  * selection the exact rank window computes.
  *
  * Input: (group, rankKey, id, payload); output: the ≤k survivors sorted
  * (rankKey asc, id asc) as (rankKey, id, payload) — rank = position + 1.
  */
class BottomKAggregator(k: Int)
  extends Aggregator[(String, Long, Long, String),
    Seq[(Long, Long, String)], Seq[(Long, Long, String)]] {

  private def bottom(items: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    items.sortBy { case (key, id, _) => (key, id) }.take(k)

  // (rankKey, id) strict order for the reject test and the sorted insert
  private def lt(a: (Long, Long, String), b: (Long, Long, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long, String)] = Seq.empty

  // The buffer is kept SORTED (rankKey asc, id asc) as an invariant —
  // zero is trivially sorted, reduce inserts in place, merge/finish go
  // through bottom() which sorts. So once the buffer is full, a row whose
  // key is >= the current k-th is rejected with ONE comparison — the
  // common case after warm-up, since only ~k·ln(n)/n of a random stream
  // ever improves a bottom-k. The r8 append-and-resort (O(k log k) alloc
  // per row) made every row pay the worst case.
  override def reduce(buf: Seq[(Long, Long, String)],
      in: (String, Long, Long, String)): Seq[(Long, Long, String)] = {
    val item = (in._2, in._3, in._4)
    if (buf.size >= k && !lt(item, buf.last)) buf
    else {
      val (below, above) = buf.span(lt(_, item))
      (below ++ (item +: above)).take(k)
    }
  }

  override def merge(b1: Seq[(Long, Long, String)],
      b2: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    bottom(b1 ++ b2)

  override def finish(reduction: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    bottom(reduction)

  override def bufferEncoder: Encoder[Seq[(Long, Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, String)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long, String)]] = bufferEncoder
}
