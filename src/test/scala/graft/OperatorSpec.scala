package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Extract, Load, Tables, TransformSales}
import graft.functions.RollingHash

/** Per-operator unit coverage for the semantic-gap list in SURVEY §7. */
class OperatorSpec extends SparkSpec {

  import spark.implicits._

  test("requireColumns tolerates extras, throws sorted missing list") {
    val df = Seq((1, "x")).toDF("order_id", "extra_col")
    assert(Extract.requireColumns(df, Set("order_id"), "t").columns.length == 2)
    val e = intercept[IllegalArgumentException] {
      Extract.requireColumns(df, Set("order_id", "b_col", "a_col"), "t")
    }
    assert(e.getMessage.contains("a_col, b_col"))
  }

  test("missing CSV path fails at plan time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Extract.readSalesCsv(spark, "/tmp/graft_definitely_missing.csv")
    }
    assert(e.getMessage.contains("graft_definitely_missing"))
  }

  test("zero-byte CSV raises empty-file; header-only passes with 0 rows") {
    val dir = Files.createTempDirectory("graft_csv_tax_").toFile
    val empty = new java.io.File(dir, "empty.csv")
    empty.createNewFile()
    val e = intercept[IllegalStateException] {
      Extract.readSalesCsv(spark, empty.getAbsolutePath)
    }
    assert(e.getMessage.contains("empty file"))
    val headerOnly = new java.io.File(dir, "header.csv")
    val w = new java.io.PrintWriter(headerOnly)
    w.println("order_id,customer_id,product_id,product_name,quantity,unit_price,order_date,category")
    w.close()
    assert(Extract.readSalesCsv(spark, headerOnly.getAbsolutePath).isEmpty)
  }

  test("structurally malformed CSV line null-pads and is kept (PERMISSIVE)") {
    val dir = Files.createTempDirectory("graft_csv_mal_").toFile
    val f = new java.io.File(dir, "sales.csv")
    val w = new java.io.PrintWriter(f)
    w.println("order_id,customer_id,product_id,product_name,quantity,unit_price,order_date,category")
    w.println("1,C1,P1,Widget,2,9.99,2024-01-15,Tools")
    w.println("garbage-line-with-too-few-columns")
    w.close()
    val rows = Extract.readSalesCsv(spark, f.getAbsolutePath)
      .orderBy(asc_nulls_last("order_id")).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("order_id") == 1L)
    // the short line keeps its one parseable cell, nulls elsewhere
    assert(rows(1).isNullAt(rows(1).fieldIndex("order_id")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("quantity")))
  }

  test("CSV extract applies schema and contract") {
    val dir = Files.createTempDirectory("graft_csv_").toFile
    val f = new java.io.File(dir, "sales.csv")
    val w = new java.io.PrintWriter(f)
    w.println("order_id,customer_id,product_id,product_name,quantity,unit_price,order_date,category,extra")
    w.println("1,C1,P1,Widget,2,9.99,2024-01-15,Tools,ignored")
    w.println("2,C2,P2,Gadget,not-a-number,5.00,bad-date,,x")
    w.close()
    val df = Extract.readSalesCsv(spark, f.getAbsolutePath)
    val rows = df.orderBy("order_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("quantity") == 2)
    assert(rows(0).getAs[java.sql.Date]("order_date") == java.sql.Date.valueOf("2024-01-15"))
    // PERMISSIVE: malformed cells → null, row kept
    assert(rows(1).isNullAt(rows(1).fieldIndex("quantity")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("order_date")))
  }

  test("JSONL source applies schema, contract, and lenient parse") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_jsonl_").toFile
    val f = new java.io.File(dir, "docs.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "hello world", "extra": true}""")
    w.println("""{"doc_id": "not-a-number", "text": "still kept"}""")
    w.close()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val df = Extract.readJsonl(spark, f.getAbsolutePath, schema,
      Set("doc_id", "text"), "docs")
    val rows = df.orderBy(col("text")).collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "hello world")
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "still kept")
    intercept[IllegalArgumentException] {
      Extract.readJsonl(spark, f.getAbsolutePath, schema,
        Set("doc_id", "text", "missing_col"), "docs")
    }
  }

  test("ORC sink/source round-trips the cleaned fact") {
    val out = Files.createTempDirectory("graft_orc_").toString + "/cs"
    val cs = Tables.dirtySales(spark, sf).limit(100)
    cs.write.mode("overwrite").orc(out)
    val back = Extract.readOrc(spark, out)
    assert(back.count() == 100)
    assert(back.schema.fieldNames.sorted.sameElements(cs.schema.fieldNames.sorted))
  }

  test("dedup keeps the src-0 row's non-key columns (keep='first' parity)") {
    val dirty = Seq(
      (1L, 1, 10L, "Original", Some("T"), 2, "5.00", Some("2024-01-01"), Some(1L), 0),
      (1L, 1, 10L, "Mutant", Some("T"), 2, "5.00", Some("2024-01-01"), Some(1L), 1))
      .toDF("order_id", "line_id", "product_id", "product_name", "category",
        "quantity", "unit_price_s", "order_date_s", "customer_id", "src")
      .withColumn("unit_price", col("unit_price_s").cast("decimal(12,2)"))
      .withColumn("order_date", col("order_date_s").cast("date"))
    val out = TransformSales.clean(dirty).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("product_name") == "Original")
  }

  test("try_divide by zero coalesces to 0 (A6 safe ratio)") {
    val r = spark.range(1)
      .select(coalesce(try_divide(lit(6.0), lit(0)), lit(0.0)).as("x"))
      .head().getDouble(0)
    assert(r == 0.0)
  }

  test("email regex matches the reference pattern semantics") {
    val cases = Seq(
      "user@example.com" -> true,
      "u.ser-x_1@sub.domain.org" -> true,
      "no-at-sign.example.com" -> false,
      "bad@domain" -> false,
      "" -> false)
    val df = cases.map(_._1).toDF("email")
      .select(col("email"), coalesce(col("email"), lit(""))
        .rlike(TransformCustomersPattern).as("v"))
    val got = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (e, exp) => assert(got(e) == exp, s"email '$e'") }
  }
  private val TransformCustomersPattern = graft.etl.TransformCustomers.emailPattern

  test("rolling_hash expression: codegen matches interpreted and spec") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 131 + (b & 0xff)) % 1000000007L)
    val inputs = Seq("", "a", "hello world", "the quick brown fox")
    val got = inputs.toDF("t")
      .select(RollingHash.rolling_hash(col("t")).as("h"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(ref))
    // SQL registration path
    RollingHash.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash('hello world')").head().getLong(0)
    assert(viaSql == ref("hello world"))
  }

  test("upsert/truncate SQL strings (K3/K5)") {
    assert(Load.truncateSql(Seq("a", "b")) ==
      "TRUNCATE TABLE a, b RESTART IDENTITY")
    val sql = Load.upsertSql("customers", "customer_id",
      Seq("customer_id", "name", "region"))
    assert(sql.contains("ON CONFLICT (customer_id) DO UPDATE SET"))
    assert(sql.contains("name = EXCLUDED.name, region = EXCLUDED.region"))
  }

  test("fill-then-group yields no null keys (property over testdata)") {
    val grouped = TransformSales.clean(Tables.dirtySales(spark, sf))
      .groupBy("category").count()
    assert(grouped.filter(col("category").isNull).count() == 0)
  }

  test("exact dedup is idempotent (property over testdata)") {
    val docs = Tables.table(spark, sf, "documents").select("doc_id", "text")
    val once = graft.ext.Dedup.exact(docs)
    val docsAgain = docs.join(once, "doc_id")
    assert(graft.ext.Dedup.exact(docsAgain).count() == once.count())
  }
}
