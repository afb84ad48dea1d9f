package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sales cleaning pipeline — reference `etl/transform.py:14-57`
  * (`transform_sales`), re-expressed as one lazy Catalyst plan:
  *
  *  1. P1 derive `total_price = quantity * unit_price` (`etl/transform.py:26`)
  *  2. P2 month bucket `yyyy-MM` (`etl/transform.py:27`) — null date → null
  *     here (pandas renders the string "NaT"); invisible downstream because
  *     F3 drops those rows before any consumer (SURVEY §7.3).
  *  3. F1 dedup on [order_id, product_id, quantity, unit_price] keeping the
  *     first occurrence (`etl/transform.py:29-35`). pandas `keep="first"` is
  *     file-order dependent; we pin determinism with
  *     `row_number() over (partition by key order by src, line_id)` — the
  *     idiom the DuckDB oracle replicates exactly (SURVEY §7.1).
  *  4. F3 drop rows with nulls in critical columns (`etl/transform.py:37-43`).
  *  5. F4 default-fill category → "Unknown" (`etl/transform.py:45-49`).
  *
  * Observability: the reference logs affected-row counts per step
  * (`etl/transform.py:21-48`). We attach a single `observe()` so the metrics
  * ride the same job instead of extra count() actions (SURVEY §7.9) — read
  * them from `QueryExecutionListener` / `df.observe` result after an action.
  *
  * Scale: the dedup window shuffles once on the dedup key — same shuffle a
  * groupBy-based dedup would need; no extra pass. All other steps are
  * narrow (no shuffle) and stay inside one WholeStageCodegen span.
  */
object TransformSales {

  val dedupKey: Seq[String] = Seq("order_id", "product_id", "quantity", "unit_price")
  val criticalCols: Seq[String] = Seq("order_id", "customer_id", "order_date", "quantity", "unit_price")

  /** @param dirty sales fact with a `src` tiebreak column (0 = original
    *              input order; see [[Tables.dirtySales]]).
    */
  def clean(dirty: DataFrame): DataFrame = {
    val observed = dirty.observe("clean_sales_metrics",
      count(when(col("order_date").isNull, 1)).as("null_order_date"),
      count(when(col("customer_id").isNull, 1)).as("null_customer_id"),
      count(when(col("category").isNull, 1)).as("null_category"))
    val derived = observed
      .withColumn("total_price", col("quantity") * col("unit_price"))
      .withColumn("month", date_format(col("order_date"), "yyyy-MM"))
    val w = Window.partitionBy(dedupKey.map(col): _*).orderBy(col("src"), col("line_id"))
    derived
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .na.drop("any", criticalCols)
      .na.fill(Map("category" -> "Unknown"))
      .select("order_id", "line_id", "product_id", "product_name", "category",
        "quantity", "unit_price", "order_date", "customer_id", "total_price", "month")
  }
}
