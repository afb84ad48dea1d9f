package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical lazy views over the driver testdata (TESTDATA.md), mapping the
  * reference's sales/customers domain (reference `data/sales.csv`,
  * `data/customers.csv`; mapping table in FIXTURES.md §3) onto the TPC-H-ish
  * star schema.
  *
  * Determinism contract (shared with the DuckDB oracle, see [[graft.Oracle]]):
  * money values in the testdata are exactly 2-decimal doubles, so we cast
  * them to DECIMAL(12,2) *before* any aggregation. Decimal addition is exact
  * and associative, so Spark's partial/final aggregation over any partitioning
  * produces bit-identical results to DuckDB's single-node sum. Final outputs
  * are cast back to DOUBLE (an exact decimal→double conversion is the same
  * IEEE value in both engines). Quantities are integral doubles → INT.
  *
  * Scale notes (100 TB):
  *  - `sales` joins lineitem⋈orders on the order key — both sides large, so
  *    this is a shuffle join on l_orderkey/o_orderkey; co-partitioning
  *    (bucketing both tables by order key) removes the shuffle on a real
  *    cluster. part is orders of magnitude smaller → broadcast hint.
  *  - All views are lazy projections: Catalyst pushes the column pruning and
  *    any consumer filters into the parquet scans (verify via
  *    `.explain("formatted")` → ReadSchema/PushedFilters).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalized to a microsecond TimestampType. The file
    * stores TIMESTAMP(NANOS) which Spark has no native type for — sessions
    * must set `spark.sql.legacy.parquet.nanosAsLong=true` (Verify/Bench do),
    * and we truncate nanos→micros exactly like DuckDB/pyarrow readers do.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet µs with isAdjustedToUTC=false reads as TIMESTAMP_NTZ
        // (the driver's round-11 testdata regeneration switched events.ts
        // from ns to µs); every session pins spark.sql.session.timeZone
        // to UTC, so this cast is the identity on the stored micros —
        // unix_micros(cast) equals DuckDB's epoch_us on the same file.
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Money type used for exact aggregation; see class doc. */
  val Money: DecimalType = DecimalType(12, 2)

  /** Sales fact columns derivable from lineitem alone (no join). Mirrors
    * reference `data/sales.csv` header minus customer_id/product_name/category.
    */
  def salesBase(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").as("line_id"),
      col("l_partkey").as("product_id"),
      col("l_quantity").cast(IntegerType).as("quantity"),
      col("l_extendedprice").cast(Money).as("unit_price"),
      to_date(col("l_shipdate")).as("order_date"))

  /** Full sales fact: reference sales.csv schema (FIXTURES.md §3 mapping).
    * lineitem⋈orders is a large-large shuffle join; part is broadcast.
    */
  def sales(spark: SparkSession, dir: String): DataFrame = {
    val orders = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("customer_id"))
    val part = table(spark, dir, "part")
      .select(col("p_partkey"), col("p_name").as("product_name"),
        col("p_type").as("category"))
    salesBase(spark, dir)
      .join(orders, col("order_id") === col("o_orderkey"))
      .join(broadcast(part), col("product_id") === col("p_partkey"))
      .drop("o_orderkey", "p_partkey")
  }

  /** Customers dim: reference customers.csv schema. email / registration_date
    * do not exist in the testdata and are synthesized deterministically
    * (FIXTURES.md §3 sanctions this); region comes from the
    * customer→nation→region snowflake, with every 11th customer nulled to
    * exercise the region default-fill (reference `etl/transform.py:86-90`).
    * Every 7th email lacks '@' to exercise the regex validator
    * (`etl/transform.py:79-84`). Both dims broadcast at any realistic scale.
    */
  def customers(spark: SparkSession, dir: String): DataFrame = {
    val nation = table(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val region = table(spark, dir, "region")
    val local = translate(lower(col("c_name")), "#", ".")
    table(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        when(col("c_custkey") % 7 === 0, local)
          .otherwise(concat(local, lit("@example.com"))).as("email"),
        date_add(to_date(lit("2023-01-01")),
          (col("c_custkey") % 400).cast(IntegerType)).as("registration_date"),
        when(col("c_custkey") % 11 === 0, lit(null).cast(StringType))
          .otherwise(col("r_name")).as("region"))
  }

  /** Sales fact with deterministic dirt injected, to exercise the reference's
    * cleaning surface on the (clean) testdata: exact duplicates on the dedup
    * key (src=1 copies of every 13th order), null category (17), null
    * order_date (23), null customer_id (19). `src` stands in for the
    * reference's "first occurrence in file order" (`keep="first"`,
    * `etl/transform.py:30`): originals sort before injected copies.
    */
  def dirtySales(spark: SparkSession, dir: String): DataFrame = {
    // The duplicate branch is built from an INDEPENDENT sales() read, not a
    // self-union: fresh attribute ids keep downstream rollup/cube column
    // resolution unambiguous (Spark's ambiguous-self-join lint
    // false-positives on rollup over shared lineage), so no session conf
    // needs relaxing. The physical plan is identical — a union scans both
    // branches either way.
    val s = sales(spark, dir)
    val u = s.withColumn("src", lit(0))
      .unionAll(sales(spark, dir).filter(col("order_id") % 13 === 0)
        .withColumn("src", lit(1)))
    u.withColumn("category",
        when(col("order_id") % 17 === 0, lit(null).cast(StringType))
          .otherwise(col("category")))
      .withColumn("order_date",
        when(col("order_id") % 23 === 0, lit(null).cast(DateType))
          .otherwise(col("order_date")))
      .withColumn("customer_id",
        when(col("order_id") % 19 === 0, lit(null).cast(LongType))
          .otherwise(col("customer_id")))
  }

  /** Customers dim with dirt: null customer_id (13), unparseable
    * registration_raw string (9) for the lenient-cast path
    * (reference `etl/transform.py:63-69`, `errors="coerce"`).
    */
  def dirtyCustomers(spark: SparkSession, dir: String): DataFrame =
    customers(spark, dir)
      .withColumn("registration_raw",
        when(col("customer_id") % 9 === 0, lit("not-a-date"))
          .otherwise(col("registration_date").cast(StringType)))
      .drop("registration_date")
      .withColumn("customer_id",
        when(col("customer_id") % 13 === 0, lit(null).cast(LongType))
          .otherwise(col("customer_id")))
}
