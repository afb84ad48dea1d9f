package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * DISTINCT 60-bit hash values seen per group; if fewer than k survive the
  * stream, the count is exact, otherwise D ≈ (k−1)·2^60 / h_k where h_k is
  * the k-th smallest hash (Bar-Yossef et al. RANDOM'02; the unbiased
  * (k−1)/r_k form and the set-operation estimators are Beyer et al.
  * SIGMOD'07 — the same family Apache DataSketches ships as the theta
  * sketch).
  *
  * Why this exists next to a7/a19's HLL: the sketch VALUE is a plain
  * sorted array of longs over a PINNED hash (md5 first 15 hex chars), so
  * unlike HLL/CMS register blobs it is exactly replayable by any engine
  * that can sort — the oracle recomputes the identical k-min set and the
  * identical IEEE-double estimate in SQL. Mergeability is set-union +
  * re-truncate (associative, commutative, idempotent), which is what makes
  * the same artifact work as a per-partition partial aggregate, a
  * per-day incremental statistic, and a set-algebra operand (a36's
  * union/intersection estimates) — none of which the count-form statistic
  * can do.
  *
  * Scale story: O(k) bounded state per group (k=64 → 512 bytes), partial
  * aggregation on the map side (each partition ships one k-array per
  * group, never its rows), and the merge is O(k) two-pointer. The reduce
  * path short-circuits on h ≥ buf.last once the buffer is full, so a
  * full buffer rejects the (D−k)/D fraction of rows with ONE comparison —
  * the insert's O(k) copy is paid O(k·log D) times total, not per row. A
  * production engine would hold the buffer in an unsafe fixed long array;
  * the Seq form keeps the Encoder free and the merge obviously correct.
  */
class KmvAggregator(k: Int)
  extends Aggregator[(String, Long), Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], in: (String, Long)): Seq[Long] = {
    val h = in._2
    if (buf.size >= k && h >= buf.last) buf
    else {
      val i = buf.indexWhere(_ >= h)
      if (i >= 0 && buf(i) == h) buf // distinct: duplicate hash, no-op
      else {
        val nb =
          if (i < 0) buf :+ h
          else (buf.take(i) :+ h) ++ buf.drop(i)
        if (nb.size > k) nb.take(k) else nb
      }
    }
  }

  /** Two-pointer merge of two sorted distinct buffers, truncated to k —
    * the set-union semantics that make the sketch order-insensitive under
    * any partial-aggregation tree.
    */
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0; var j = 0
    while (out.size < k && (i < b1.size || j < b2.size)) {
      if (j >= b2.size || (i < b1.size && b1(i) <= b2(j))) {
        if (i < b1.size) {
          if (out.isEmpty || out.last != b1(i)) out += b1(i)
          i += 1
        }
      } else {
        if (out.isEmpty || out.last != b2(j)) out += b2(j)
        j += 1
      }
    }
    out.toSeq
  }

  override def finish(reduction: Seq[Long]): Seq[Long] = reduction

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}

object KmvSketch {

  /** 2^60 — the hash domain size. Exactly representable as a double (a
    * power of two), so (k−1)·2^60 is an EXACT double product for any
    * k ≤ 2^53-ish, and the estimate is one IEEE division — bit-identical
    * in any engine that parses the same literal (the PoissonCdf60
    * shared-constant discipline).
    */
  val Domain: Double = 1.152921504606846976e18

  /** The repo's standard layout-independent 60-bit hash: md5 first 15 hex
    * chars as a BIGINT (the a31 draw device). DuckDB replay:
    * `CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Distinct-count estimate from a k-min sketch column (sorted ascending
    * array): exact size below k, (k−1)·2^60/h_k at k. `element_at` is
    * 1-indexed, so position k is the largest kept hash.
    */
  def estimate(kmin: Column, k: Int): Column =
    when(size(kmin) < k, size(kmin).cast("double"))
      .otherwise(lit((k - 1).toDouble * Domain) /
        element_at(kmin, k).cast("double"))
}
