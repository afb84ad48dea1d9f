package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for every left row, the latest right row with
  * `right.ts <= left.ts` on the same key (the time-series enrichment join
  * Spark lacks as a built-in; kdb's `aj`, DuckDB's ASOF JOIN).
  *
  * Implementation is the scalable tagged-union idiom rather than a range
  * join: union both sides, one shuffle+sort per key on (ts, side), then
  * `last(payload, ignoreNulls)` over an unbounded-preceding frame carries
  * the most recent right payload forward into each left row. Cost is ONE
  * shuffle of |L|+|R| rows — no quadratic range cross-product, no
  * per-row binary search; skew on the key column salts like any other
  * shuffle. Right rows sort before left rows at equal timestamps, so
  * `ts_left == ts_right` matches (>= semantics, like DuckDB's ASOF).
  *
  * Output: all left columns + the right side's non-key columns prefixed
  * `right_`. Inner semantics: left rows with no prior right row drop.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == key)
    val payload = struct(payloadCols.map(col): _*)
    val r = right.select(Seq(col(key), col(ts)) :+ payload.as("_payload"): _*)
      .withColumn("_side", lit(0))
    val l = left
      .withColumn("_payload", lit(null).cast(r.schema("_payload").dataType))
      .withColumn("_side", lit(1))
    val unioned = l.unionByName(r.select(col(key), col(ts).as(ts),
      col("_payload"), col("_side")), allowMissingColumns = true)
    // _payload as final sort key: a deterministic winner if two right rows
    // tie exactly on (key, ts)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("_side"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_match").isNotNull)
    val rightOut = payloadCols.map(c => col("_match").getField(c).as(s"right_$c"))
    matched.select(left.columns.map(col) ++ rightOut: _*)
  }
}
