package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Customers cleaning pipeline — reference `etl/transform.py:60-97`
  * (`transform_customers`):
  *
  *  1. P3 lenient date cast: unparseable → null, not error
  *     (`errors="coerce"`, `etl/transform.py:63-69`) → `try_to_date`, which
  *     stays null-lenient under Spark 4's default ANSI mode (SURVEY §7.2).
  *  2. F2 drop rows with null customer_id (`etl/transform.py:71-76`).
  *  3. P4 email regex validation (`etl/transform.py:79-84`): the reference's
  *     only row-wise UDF becomes a codegen'd `rlike` — no UDF. Null email is
  *     first coalesced to "" exactly like `fillna("")`.
  *  4. F5 default-fill region → "Unknown" (`etl/transform.py:86-90`).
  *  5. P5 tenure: `customer_days = snapshot − registration_date` in days
  *     (`etl/transform.py:92-94`). The snapshot is an explicit parameter —
  *     the reference's `Timestamp.today()` default is nondeterministic and
  *     its own test injects a fixed date (`tests/test_transform.py:70`).
  *
  * Scale: entirely narrow operations — zero shuffles, one codegen stage.
  */
object TransformCustomers {

  /** `\w` spelled as an explicit class so Java regex (Spark) and RE2
    * (DuckDB oracle) agree byte-for-byte. Reference pattern:
    * `^[\w\.-]+@[\w\.-]+\.\w+$` (`etl/transform.py:79`).
    */
  val emailPattern = "^[A-Za-z0-9_.-]+@[A-Za-z0-9_.-]+\\.[A-Za-z0-9_]+$"

  val defaultSnapshot: Date = Date.valueOf("2026-01-01")

  /** @param dirty customers dim with raw `registration_raw` string column
    *              (see [[Tables.dirtyCustomers]]).
    */
  def clean(dirty: DataFrame, snapshot: Date = defaultSnapshot): DataFrame = {
    val observed = dirty.observe("clean_customers_metrics",
      count(when(col("customer_id").isNull, 1)).as("null_customer_id"),
      count(when(col("region").isNull, 1)).as("null_region"))
    val reg = try_to_date(col("registration_raw"))
    observed
      .filter(col("customer_id").isNotNull)
      .withColumn("registration_date", reg)
      .withColumn("is_email_valid",
        coalesce(col("email"), lit("")).rlike(emailPattern))
      .withColumn("customer_days",
        datediff(lit(snapshot), col("registration_date")).cast(IntegerType))
      .na.fill(Map("region" -> "Unknown"))
      .select("customer_id", "customer_name", "email", "registration_date",
        "region", "is_email_valid", "customer_days")
  }
}
