package graft

import graft.etl.{Observed, Pipelines, Tables, TransformSales}
import graft.ext.Clusters

class ClusterAndObserveSpec extends SparkSpec {

  import spark.implicits._

  test("connected components: min-label over components, singletons excluded") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (3L, 4L))
      .toDF("id1", "id2")
    val got = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("observe() metrics ride the cleaning job") {
    val dirty = Tables.dirtySales(spark, sf)
    val expectedNullCat = dirty.filter($"category".isNull).count()
    val (_, metrics) = Observed.capture(spark, Set("clean_sales_metrics")) {
      TransformSales.clean(dirty).count()
    }
    val m = metrics("clean_sales_metrics")
    assert(m("null_category").asInstanceOf[Long] == expectedNullCat)
    assert(m("null_customer_id").asInstanceOf[Long] > 0)
  }

  test("cached pipeline returns consistent results across consumers") {
    val a = Pipelines.cleanSales(spark, sf).count()
    val b = Pipelines.cleanSales(spark, sf).count()
    assert(a == b && a > 0)
  }
}
