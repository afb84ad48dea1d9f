package graft

import java.sql.DriverManager

import graft.etl.Load

/** EXECUTED JDBC sink coverage (reference `etl/load.py:81-109` semantics):
  * the per-partition batched upsert runs against an embedded Derby — real
  * connections from executor threads, not SQL-string assertions — and must
  * be idempotent (re-applying a batch changes nothing) with non-key columns
  * updated on conflict.
  */
class LoadSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:upsertdb;create=true"

  private def readAll(): List[(Int, String, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT customer_id, customer_name, region FROM customers ORDER BY customer_id")
      val buf = scala.collection.mutable.ListBuffer.empty[(Int, String, String)]
      while (rs.next()) buf += ((rs.getInt(1), rs.getString(2), rs.getString(3)))
      buf.toList
    } finally conn.close()
  }

  test("upsert executes against an embedded DB, updates on conflict, idempotent") {
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      """CREATE TABLE customers (customer_id INT PRIMARY KEY,
        |customer_name VARCHAR(100), region VARCHAR(50))""".stripMargin)
    finally conn.close()

    val sess = spark
    import sess.implicits._
    val cols = Seq("customer_id", "customer_name", "region")
    val types = Map("customer_id" -> "INT",
      "customer_name" -> "VARCHAR(100)", "region" -> "VARCHAR(50)")
    val merge = Some(Load.mergeSql("customers", "customer_id", cols, types))
    assert(merge.get._2 == Seq("customer_id", "customer_name", "region",
      "customer_id", "customer_name", "region"))

    val v1 = Seq((1, "alice", "EUROPE"), (2, "bob", "ASIA"), (3, "carol", "AFRICA"))
      .toDF(cols: _*)
    Load.upsert(v1.repartition(2), url, "customers", "customer_id", "", "", merge)
    assert(readAll() ==
      List((1, "alice", "EUROPE"), (2, "bob", "ASIA"), (3, "carol", "AFRICA")))

    // conflicting keys update non-key columns; new keys insert
    val v2 = Seq((2, "bob", "EUROPE"), (4, "dave", "ASIA")).toDF(cols: _*)
    Load.upsert(v2.repartition(2), url, "customers", "customer_id", "", "", merge)
    val expected = List((1, "alice", "EUROPE"), (2, "bob", "EUROPE"),
      (3, "carol", "AFRICA"), (4, "dave", "ASIA"))
    assert(readAll() == expected)

    // re-applying the same batch is a no-op (retried-task safety)
    Load.upsert(v2.repartition(2), url, "customers", "customer_id", "", "", merge)
    assert(readAll() == expected)
  }
}
