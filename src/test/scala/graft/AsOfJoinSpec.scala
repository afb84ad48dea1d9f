package graft

import org.apache.spark.sql.functions._

import graft.ext.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asof join matches latest right at-or-before, drops unmatched") {
    val left = Seq(
      (1L, 100L, "p1"), // matches right at ts 100 (equality included)
      (1L, 150L, "p2"), // matches right at ts 100 (not 200)
      (1L, 250L, "p3"), // matches right at ts 200
      (2L, 50L, "p4"))  // no right row at or before → dropped
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 100L, "r100"),
      (1L, 200L, "r200"),
      (2L, 99L, "r99"))
      .toDF("k", "ts", "label")
    val out = AsOfJoin.asofJoin(left, right, key = "k", ts = "ts")
      .select(col("tag"), col("right_label"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("p1" -> "r100", "p2" -> "r100", "p3" -> "r200"))
  }

  test("topk aggregator keeps k-bounded buffers and total ordering") {
    val agg = new graft.functions.TopKAggregator(2)
    val items = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0))
    // merge order must not matter
    val b1 = items.take(2).foldLeft(agg.zero)(agg.reduce)
    val b2 = items.drop(2).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1, b2)) == Seq((2L, 9.0), (3L, 9.0)))
    assert(agg.finish(agg.merge(b2, b1)) == Seq((2L, 9.0), (3L, 9.0)))
  }
}
