package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions function set is SQL-callable once installed") {
    // getOrCreate would reuse the shared suite session and silently drop
    // .withExtensions, so drive the same function tuples via install()
    val s: SparkSession = spark
    GraftExtensions.install(s)
    val h = s.sql("SELECT rolling_hash('hello world') AS h").head().getLong(0)
    val ref = "hello world".getBytes("UTF-8")
      .foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 1000000007L)
    assert(h == ref)
    val d = s.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
  }
}
