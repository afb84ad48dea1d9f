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

  test("asofNearest: picks the closer side within tolerance, prior wins ties, replay equal") {
    val sess = spark
    import sess.implicits._
    import graft.ext.AsOfJoin
    val left = Seq(
      (1L, 100L, "p_mid"),    // back at 90 (d=10), fwd at 105 (d=5) → next
      (1L, 89L, "p_back"),    // back at 80 (d=9), fwd at 90 (d=1) → next
      (1L, 95L, "p_tie"),     // back at 90 (d=5), fwd at 100? no right at 100;
      (2L, 50L, "p_far"),     // nearest right at 200 (d=150) > tol → drop
      (3L, 70L, "p_eq"))      // right exactly at 70 → prior, d=0
      .toDF("k", "ts_us", "tag")
      .select(col("k"), org.apache.spark.sql.functions.timestamp_micros(col("ts_us")).as("ts"), col("tag"))
    val right = Seq(
      (1L, 80L, 800L), (1L, 90L, 900L), (1L, 105L, 1050L),
      (2L, 200L, 2000L),
      (3L, 70L, 700L), (3L, 70L, 701L)) // same-ts pair: prior picks MAX id
      .toDF("k", "ts_us", "rid")
      .select(col("k"), org.apache.spark.sql.functions.timestamp_micros(col("ts_us")).as("ts"), col("rid"))
    val out = AsOfJoin.asofNearest(left, right, key = "k", ts = "ts",
        tolUs = 20L)
      .select(col("tag"), col("right_rid"), col("matched_dir"),
        col("delta_us"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      "p_mid" -> (1050L, "next", 5L),
      "p_back" -> (900L, "next", 1L),
      "p_tie" -> (900L, "prior", 5L),
      "p_eq" -> (701L, "prior", 0L)))
    assert(!out.contains("p_far"), "tolerance must drop the far purchase")
    // j13 on real events: both directions occur, all deltas within tol
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("j13_asof_nearest")(spark, dir)
      .collect()
      .map(r => (r.getString(5), r.getLong(6)))
    assert(got.nonEmpty)
    assert(got.forall(_._2 <= 172800000000L))
    assert(got.exists(_._1 == "prior") && got.exists(_._1 == "next"),
      "fixture exercises only one direction — tolerance or data drifted")
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
