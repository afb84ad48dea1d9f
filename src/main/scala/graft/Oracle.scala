package graft

/** Shared DuckDB SQL prelude for `SparkEntry.oracleSql`. Each CTE mirrors a
  * view in [[graft.etl.Tables]] / a transform in [[graft.etl]] exactly —
  * same synthesized columns, same dirt injection, same decimal casts — so a
  * hash-compare of Spark vs DuckDB results is meaningful. See Tables' class
  * doc for the decimal determinism contract.
  */
object Oracle {

  /** TESTDATA.md lists only the 8 star-schema tables as driver-registered
    * names; documents/embeddings are provided as parquet but may not get
    * views in the oracle's DuckDB session. These CTEs shadow (or supply)
    * the names from the files directly — `{SFDIR}` is substituted with the
    * actual data dir by [[graft.Verify]] when dumping oracle_sql.json.
    */
  val corpusTables: String =
    """documents AS (SELECT * FROM read_parquet('{SFDIR}/documents.parquet')),
      |embeddings AS (SELECT * FROM read_parquet('{SFDIR}/embeddings.parquet'))""".stripMargin

  val salesBase: String =
    """sales_base AS (
      |  SELECT l_orderkey AS order_id, l_linenumber AS line_id,
      |         l_partkey AS product_id,
      |         CAST(l_quantity AS INTEGER) AS quantity,
      |         CAST(l_extendedprice AS DECIMAL(12,2)) AS unit_price,
      |         CAST(l_shipdate AS DATE) AS order_date
      |  FROM lineitem)""".stripMargin

  val sales: String =
    """sales AS (
      |  SELECT b.order_id, b.line_id, b.product_id, b.quantity, b.unit_price,
      |         b.order_date, o.o_custkey AS customer_id,
      |         p.p_name AS product_name, p.p_type AS category
      |  FROM sales_base b
      |  JOIN orders o ON b.order_id = o.o_orderkey
      |  JOIN part p ON b.product_id = p.p_partkey)""".stripMargin

  val customers: String =
    """customers AS (
      |  SELECT c.c_custkey AS customer_id,
      |         c.c_name AS customer_name,
      |         CASE WHEN c.c_custkey % 7 = 0
      |              THEN translate(lower(c.c_name), '#', '.')
      |              ELSE translate(lower(c.c_name), '#', '.') || '@example.com'
      |         END AS email,
      |         DATE '2023-01-01' + CAST(c.c_custkey % 400 AS INTEGER) AS registration_date,
      |         CASE WHEN c.c_custkey % 11 = 0 THEN NULL ELSE r.r_name END AS region
      |  FROM customer c
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey)""".stripMargin

  val dirtySales: String =
    """dirty_sales AS (
      |  SELECT u.order_id, u.line_id, u.product_id, u.quantity, u.unit_price,
      |         CASE WHEN u.order_id % 23 = 0 THEN NULL ELSE u.order_date END AS order_date,
      |         CASE WHEN u.order_id % 19 = 0 THEN NULL ELSE u.customer_id END AS customer_id,
      |         u.product_name,
      |         CASE WHEN u.order_id % 17 = 0 THEN NULL ELSE u.category END AS category,
      |         u.src
      |  FROM (SELECT s.*, 0 AS src FROM sales s
      |        UNION ALL
      |        SELECT s.*, 1 AS src FROM sales s WHERE s.order_id % 13 = 0) u)""".stripMargin

  val dirtyCustomers: String =
    """dirty_customers AS (
      |  SELECT CASE WHEN customer_id % 13 = 0 THEN NULL ELSE customer_id END AS customer_id,
      |         customer_name, email,
      |         CASE WHEN customer_id % 9 = 0 THEN 'not-a-date'
      |              ELSE CAST(registration_date AS VARCHAR) END AS registration_raw,
      |         region
      |  FROM customers)""".stripMargin

  /** Mirrors [[graft.etl.TransformSales.clean]]: derive total_price + month,
    * dedup keep-"first" on the reference key via ROW_NUMBER (SURVEY §7.1),
    * drop critical nulls, default-fill category.
    */
  val cleanSales: String =
    """clean_sales AS (
      |  SELECT order_id, line_id, product_id, product_name,
      |         COALESCE(category, 'Unknown') AS category,
      |         quantity, unit_price, order_date, customer_id,
      |         total_price, month
      |  FROM (SELECT d.*,
      |               d.quantity * d.unit_price AS total_price,
      |               strftime(d.order_date, '%Y-%m') AS month,
      |               ROW_NUMBER() OVER (
      |                 PARTITION BY d.order_id, d.product_id, d.quantity, d.unit_price
      |                 ORDER BY d.src, d.line_id) AS rn
      |        FROM dirty_sales d)
      |  WHERE rn = 1
      |    AND order_id IS NOT NULL AND customer_id IS NOT NULL
      |    AND order_date IS NOT NULL AND quantity IS NOT NULL
      |    AND unit_price IS NOT NULL)""".stripMargin

  /** Mirrors [[graft.etl.TransformCustomers.clean]] with snapshot 2026-01-01. */
  val cleanCustomers: String =
    """clean_customers AS (
      |  SELECT customer_id, customer_name, email,
      |         TRY_CAST(registration_raw AS DATE) AS registration_date,
      |         COALESCE(region, 'Unknown') AS region,
      |         regexp_matches(COALESCE(email, ''),
      |           '^[A-Za-z0-9_.-]+@[A-Za-z0-9_.-]+\.[A-Za-z0-9_]+$') AS is_email_valid,
      |         CAST(date_diff('day', TRY_CAST(registration_raw AS DATE),
      |                        DATE '2026-01-01') AS INTEGER) AS customer_days
      |  FROM dirty_customers
      |  WHERE customer_id IS NOT NULL)""".stripMargin

  private val all = Seq(corpusTables, salesBase, sales, customers, dirtySales,
    dirtyCustomers, cleanSales, cleanCustomers)

  /** Full prelude + query body. DuckDB binds unused CTEs but only executes
    * the ones the body references.
    */
  def sql(body: String): String =
    all.mkString("WITH ", ",\n", "\n") + body

  /** Prelude + query-specific extra CTEs + body. `extra` is one or more
    * `name AS (...)` clauses, comma-separated.
    */
  def sqlWith(extra: String, body: String): String =
    all.mkString("WITH ", ",\n", ",\n") + extra + "\n" + body

  /** Like [[sqlWith]] but declares WITH RECURSIVE (DuckDB requires the
    * keyword up front even when only one CTE recurses).
    */
  def sqlRecursive(extra: String, body: String): String =
    all.mkString("WITH RECURSIVE ", ",\n", ",\n") + extra + "\n" + body
}
