package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Pipelines, Tables, TransformSales}

/** Sort-key-totality lint — the mechanical gate for the determinism bug
  * class that shipped three times (r2 tiebreaks, r4 t12 type drift, r6 w3
  * frame drift): a window/rank/dedup whose ORDER BY is not a total order
  * over rows that can differ in an emitted column produces engine-dependent
  * results that no amount of float discipline fixes.
  *
  * For every windowed/deduping query the rule is: group the window's INPUT
  * by (partition cols ++ order cols) and assert that any tied rows are
  * identical in every other column — then the tie order cannot matter.
  * Runs at sf0.001 and sf0.01 (the correctness-gate scale); set
  * GRAFT_SORTKEY_SF=/root/testdata/sf0.1 to include the sweep scale.
  *
  * Queries whose tiebreak column is group-unique BY CONSTRUCTION (w1/a10/t8
  * rank over a groupBy output keyed by the tiebreak; c9/c10/c11 order by
  * doc_id) are covered transitively by the doc_id/source-key uniqueness
  * checks here.
  */
class SortKeySpec extends SparkSpec {

  private val dirs: Seq[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01") ++
      sys.env.get("GRAFT_SORTKEY_SF")

  /** Count of key-groups containing rows that DIFFER in a non-key column —
    * exactly the groups where sort-tie order would leak into results.
    */
  private def ambiguousTies(df: DataFrame, key: Seq[String]): Long = {
    val others = df.columns.filterNot(key.contains).toSeq
    val distinctOthers =
      if (others.isEmpty) lit(1L)
      else countDistinct(struct(others.map(col): _*))
    df.groupBy(key.map(col): _*)
      .agg(distinctOthers.as("nd"))
      .filter(col("nd") > 1)
      .count()
  }

  test("w3: the extended window key is total over clean_sales") {
    val key = Seq("customer_id", "order_date", "order_id", "line_id",
      "product_id", "quantity", "unit_price")
    for (dir <- dirs)
      assert(ambiguousTies(Pipelines.cleanSales(spark, dir), key) === 0L,
        s"w3 window key not total at $dir")
  }

  test("w3 regression: the pre-fix key (order_date, order_id, line_id) is NOT total") {
    // Documents WHY the key had to grow: lineitem (l_orderkey, l_linenumber)
    // is non-unique in the generated testdata (TESTDATA.md), so the r6 key
    // left ambiguous ties with differing total_price. This lint would have
    // failed pre-ship.
    val oldKey = Seq("customer_id", "order_date", "order_id", "line_id")
    val amb = ambiguousTies(
      Pipelines.cleanSales(spark, "/root/testdata/sf0.01"), oldKey)
    assert(amb > 0L, "expected ambiguous ties under the r6 w3 key — " +
      "if the testdata became (orderkey, linenumber)-unique this check " +
      "and TESTDATA.md need updating")
  }

  test("f1: the dedup tiebreak (dedupKey, src, line_id) leaves no ambiguous survivors") {
    val key = TransformSales.dedupKey ++ Seq("src", "line_id")
    for (dir <- dirs)
      assert(ambiguousTies(Tables.dirtySales(spark, dir), key) === 0L,
        s"f1 dedup tiebreak ambiguous at $dir")
  }

  test("events: (user_id, ts, event_id) is total for w2/b1/st* orderings") {
    val key = Seq("user_id", "ts", "event_id")
    for (dir <- dirs)
      assert(ambiguousTies(Tables.events(spark, dir), key) === 0L,
        s"events window key not total at $dir")
  }

  test("documents: doc_id is unique (c9/c10/c11/t* tiebreak column)") {
    for (dir <- dirs) {
      val dups = Tables.table(spark, dir, "documents")
        .groupBy("doc_id").count().filter(col("count") > 1).count()
      assert(dups === 0L, s"doc_id not unique at $dir")
    }
  }

  test("embeddings: vec_id is unique (s*/v* tiebreak column)") {
    for (dir <- dirs) {
      val dups = Tables.table(spark, dir, "embeddings")
        .groupBy("vec_id").count().filter(col("count") > 1).count()
      assert(dups === 0L, s"vec_id not unique at $dir")
    }
  }
}
