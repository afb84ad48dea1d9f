package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Aggregates, TransformCustomers, TransformSales}

/** Ports of the reference's four unit tests (`tests/test_transform.py`,
  * semantics catalogued in SURVEY §5) — the executable semantic specs for
  * dedup, null handling, derives, summary aggregation and ranking.
  */
class ReferenceParitySpec extends SparkSpec {

  import spark.implicits._

  private def dirtySales(rows: Seq[(Long, Int, Long, String, Option[String],
      Int, String, Option[String], Option[Long], Int)]): DataFrame =
    rows.toDF("order_id", "line_id", "product_id", "product_name", "category",
        "quantity", "unit_price_s", "order_date_s", "customer_id", "src")
      .withColumn("unit_price", col("unit_price_s").cast("decimal(12,2)"))
      .withColumn("order_date", col("order_date_s").cast("date"))
      .drop("unit_price_s", "order_date_s")

  test("transform_sales deduplicates, drops null customers, derives, fills") {
    // mirrors test_transform_sales_deduplicates_and_enriches
    // (tests/test_transform.py:11-66)
    val out = TransformSales.clean(dirtySales(Seq(
      (1L, 1, 10L, "Widget", Some("Tools"), 2, "50.00", Some("2024-01-15"), Some(7L), 0),
      (1L, 1, 10L, "Widget", Some("Tools"), 2, "50.00", Some("2024-01-15"), Some(7L), 1), // exact dup
      (2L, 1, 11L, "Gadget", None, 1, "200.00", Some("2024-01-20"), Some(8L), 0), // null category
      (3L, 1, 12L, "Thing", Some("Tools"), 1, "75.00", Some("2024-02-01"), None, 0)))) // null customer
      .orderBy("order_id")
      .collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getAs[java.math.BigDecimal]("total_price").doubleValue() == 100.0)
    assert(r1.getAs[String]("month") == "2024-01")
    assert(out(1).getAs[String]("category") == "Unknown")
  }

  test("transform_customers validates email, computes tenure, fills region") {
    // mirrors test_transform_customers_validates_email_and_computes_days
    // (tests/test_transform.py:69-96): 2024-01-01 → 2024-02-01 is 31 days
    // (day-diff, not day-count)
    val dirty = Seq(
      (Some(1L), "Alice", "alice@example.com", "2024-01-01", Some("West")),
      (Some(2L), "Bob", "not-an-email", "2024-01-01", None),
      (Option.empty[Long], "Carol", "c@x.com", "2024-01-01", Some("East")))
      .toDF("customer_id", "customer_name", "email", "registration_raw", "region")
    val out = TransformCustomers.clean(dirty, Date.valueOf("2024-02-01"))
      .orderBy("customer_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Boolean]("is_email_valid"))
    assert(out(0).getAs[Int]("customer_days") == 31)
    assert(!out(1).getAs[Boolean]("is_email_valid"))
    assert(out(1).getAs[String]("region") == "Unknown")
  }

  test("sales_summary aggregates with distinct-order average") {
    // mirrors test_create_sales_summary_aggregates_correctly
    // (tests/test_transform.py:99-114): 2 rows, ONE order → avg 300.0
    val clean = TransformSales.clean(dirtySales(Seq(
      (1L, 1, 10L, "A", Some("Electronics"), 1, "100.00", Some("2024-01-10"), Some(5L), 0),
      (1L, 2, 11L, "B", Some("Electronics"), 2, "100.00", Some("2024-01-11"), Some(5L), 0))))
    val out = Aggregates.salesSummary(clean).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Double]("total_sales") == 300.0)
    assert(r.getAs[Long]("total_quantity") == 3L)
    assert(r.getAs[Long]("order_count") == 1L)
    assert(r.getAs[Double]("average_order_value") == 300.0)
    assert(r.getAs[Date]("period_date") == Date.valueOf("2024-01-01"))
  }

  test("product_ranking sorts by units then revenue and limits top-n") {
    // mirrors test_create_product_ranking_limits_top_n
    // (tests/test_transform.py:117-131): qty 7 ranks first despite lower
    // revenue; top_n=2 cuts the third product
    val clean = TransformSales.clean(dirtySales(Seq(
      (1L, 1, 21L, "ManyCheap", Some("T"), 7, "1.00", Some("2024-01-10"), Some(1L), 0),
      (2L, 1, 22L, "FewPricey", Some("T"), 5, "100.00", Some("2024-01-11"), Some(2L), 0),
      (3L, 1, 23L, "Least", Some("T"), 3, "10.00", Some("2024-01-12"), Some(3L), 0))))
    val out = Aggregates.productRanking(clean, topN = 2)
      .orderBy("rank_position").collect()
    assert(out.map(_.getAs[Long]("rank_position")).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[String]("product_name") == "ManyCheap")
    assert(out(1).getAs[String]("product_name") == "FewPricey")
  }
}
