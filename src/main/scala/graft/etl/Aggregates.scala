package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four analytic aggregates (`etl/transform.py:100-157`),
  * re-planned Spark-first.
  *
  * Key divergence from the reference (SURVEY §4): `create_sales_summary`
  * does TWO group-bys over the same keys plus a left self-join to recombine
  * (`etl/transform.py:102-109`) — a pandas workaround. We fuse sum + sum +
  * countDistinct into ONE `agg`; Catalyst plans the distinct aggregate via
  * expand + two-phase HashAggregate, and the self-join disappears. Results
  * are identical (a left join on its own grouping keys is row-wise a no-op).
  *
  * Scale notes:
  *  - every aggregate here shuffles exactly once on its grouping key, with
  *    map-side partial aggregation;
  *  - `countDistinct` is exact (oracle-checked); at 100 TB swap in
  *    `approx_count_distinct` where a ±2% estimate is acceptable;
  *  - productRanking takes top-k BEFORE applying the rank window, so the
  *    single-partition window sees ≤ n rows, never the full product set
  *    (the sort+limit pair fuses into TakeOrderedAndProject).
  */
object Aggregates {

  /** sales_summary — `etl/transform.py:100-117`. One row per
    * (category, month) with total sales/quantity, distinct-order count and
    * average order value (safe 0-denominator → 0, `etl/transform.py:111-112`).
    */
  def salesSummary(cleanSales: DataFrame): DataFrame =
    cleanSales
      .groupBy("category", "month")
      .agg(
        sum("total_price").as("total_sales_dec"),
        sum("quantity").as("total_quantity"),
        countDistinct("order_id").as("order_count"))
      .select(
        col("category"), col("month"),
        col("total_sales_dec").cast("double").as("total_sales"),
        col("total_quantity").cast("long").as("total_quantity"),
        col("order_count").cast("long").as("order_count"),
        coalesce(try_divide(col("total_sales_dec").cast("double"), col("order_count")),
          lit(0.0)).as("average_order_value"),
        to_date(concat(col("month"), lit("-01"))).as("period_date"))

  /** product_ranking — `etl/transform.py:145-157`. Top-n products by units
    * sold then revenue, with a dense 1..n rank. Tie-break pinned on
    * product_id for determinism (SURVEY §7.6).
    */
  def productRanking(cleanSales: DataFrame, topN: Int = 5): DataFrame = {
    val byRank = Seq(col("total_sold").desc, col("total_revenue").desc, col("product_id"))
    cleanSales
      .groupBy("product_id", "product_name")
      .agg(
        sum("quantity").cast("long").as("total_sold"),
        sum("total_price").cast("double").as("total_revenue"))
      .orderBy(byRank: _*)
      .limit(topN)
      .withColumn("rank_position",
        row_number().over(Window.orderBy(byRank: _*)).cast("long"))
  }

  /** avg_check_by_region — `etl/transform.py:120-142`: per-order roll-up,
    * left join to the customers dim (broadcast — dims are always the small
    * side), unmatched region → "Unknown", then region-level mean check and
    * distinct-order count.
    *
    * avg_check is computed as exact-decimal sum ÷ distinct count rather than
    * `avg()` so the double result is bit-identical to the oracle.
    */
  def avgCheckByRegion(cleanSales: DataFrame, cleanCustomers: DataFrame): DataFrame = {
    val orderTotals = cleanSales
      .groupBy("order_id", "customer_id")
      .agg(sum("total_price").as("order_total"))
    orderTotals
      .join(broadcast(cleanCustomers.select("customer_id", "region")),
        Seq("customer_id"), "left")
      .withColumn("region", coalesce(col("region"), lit("Unknown")))
      .groupBy("region")
      .agg(
        (sum("order_total").cast("double") / countDistinct("order_id")).as("avg_check"),
        countDistinct("order_id").cast("long").as("orders_count"))
      .orderBy(col("avg_check").desc, col("region"))
  }
}
