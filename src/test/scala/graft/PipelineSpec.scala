package graft

import java.nio.file.Files

import graft.etl.Pipeline

/** One-command pipeline over the reference's own CSV inputs: the four
  * loaded outputs exist with plausible shapes, and the orchestration
  * behaviors (bounded retry, exhausted-retry failure) hold.
  */
class PipelineSpec extends SparkSpec {

  test("pipeline runs the reference CSVs end-to-end into four outputs") {
    val out = Files.createTempDirectory("graft_pipeline_").toString
    val blocksBefore = spark.sparkContext.getPersistentRDDs.keySet
    val counts = Pipeline.run(spark, "/root/reference/data", out)
    // the CacheScope contract: a completed run leaves no net persisted
    // blocks (the cleanSales cache and any operator checkpoints are
    // dropped with the scope)
    assert(spark.sparkContext.getPersistentRDDs.keySet == blocksBefore,
      "pipeline run leaked persisted blocks past its CacheScope")
    assert(counts.keySet == Set("clean_sales", "clean_customers",
      "sales_summary", "product_ranking"))
    assert(counts("clean_sales") > 0 && counts("clean_sales") <= 200,
      s"clean sales should keep <= the 200 raw rows: $counts")
    assert(counts("clean_customers") > 0 && counts("clean_customers") <= 50)
    assert(counts("product_ranking") == 5, s"top-5 ranking: $counts")
    assert(counts("sales_summary") > 0)
    // the sink really has the four parquet tables with the sink-cast schema
    val sales = spark.read.parquet(s"$out/clean_sales")
    assert(sales.count() == counts("clean_sales"))
    assert(sales.schema("unit_price").dataType.typeName.startsWith("decimal"))
    val ranking = spark.read.parquet(s"$out/product_ranking")
    assert(ranking.columns.toSet == Set("product_id", "product_name",
      "total_sold", "total_revenue", "rank_position"))
    assert(ranking.collect().map(_.getAs[Long]("rank_position")).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("CacheScope: composed checkpointing operators leave no net blocks; caller blocks survive") {
    // the r9 lifecycle gap: c3 (shingle-index checkpoints) then c17
    // (survivorship) composed in ONE session used to accumulate every
    // intermediate block — the scope must drop exactly those
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CacheScope.scoped(spark) {
      SparkEntry.queries("c3_fuzzy_corpus")(spark, sf).count()
      SparkEntry.queries("c17_dedup_survivor")(spark, sf).count()
      assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size,
        "fixture queries no longer persist anything — pick other ops")
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "composed queries leaked blocks past the scope")
    // blocks persisted BEFORE the scope are the caller's — they survive
    val kept = spark.sparkContext.parallelize(1 to 10).persist()
    kept.count()
    CacheScope.scoped(spark) {
      SparkEntry.queries("c3_fuzzy_corpus")(spark, sf).count()
    }
    assert(spark.sparkContext.getPersistentRDDs.contains(kept.id),
      "the scope swept a pre-existing caller block")
    kept.unpersist(blocking = true)
  }

  test("pipeline jdbc branch loads four tables into an embedded DB") {
    val url = s"jdbc:derby:memory:pipedb${System.nanoTime()};create=true"
    val counts = Pipeline.run(spark, "/root/reference/data", url)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      counts.foreach { case (table, n) =>
        val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
        rs.next()
        assert(rs.getLong(1) == n, s"$table: db rows vs reported count")
      }
    } finally conn.close()
    assert(counts("product_ranking") == 5)
  }

  test("retry probe retries to success and fails fast when exhausted") {
    var calls = 0
    val got = Pipeline.retry(maxRetries = 5, delayMs = 1) { () =>
      calls += 1
      if (calls < 3)
        throw new java.sql.SQLTransientConnectionException("not ready")
      else 42
    }
    assert(got == 42 && calls == 3)

    var failCalls = 0
    val e = intercept[java.sql.SQLException] {
      Pipeline.retry(maxRetries = 3, delayMs = 1) { () =>
        failCalls += 1
        throw new java.sql.SQLNonTransientConnectionException("db down")
      }
    }
    assert(failCalls == 3 && e.getMessage == "db down")
  }

  test("retry rethrows permanent failures immediately (no backoff burn)") {
    // bad credentials / SQL syntax are not connection failures: the probe
    // must fail on the FIRST attempt, not after maxRetries * delayMs
    var calls = 0
    val e = intercept[RuntimeException] {
      Pipeline.retry(maxRetries = 10, delayMs = 10000) { () =>
        calls += 1
        sys.error("syntax error at or near")
      }
    }
    assert(calls == 1, s"permanent failure retried $calls times")
    assert(e.getMessage.contains("syntax error"))
    // SQLSTATE class 08 (connection exception) IS retryable even via the
    // generic SQLException type most drivers throw
    assert(Pipeline.connectionFailure(
      new java.sql.SQLException("conn refused", "08001")))
    assert(!Pipeline.connectionFailure(
      new java.sql.SQLException("bad password", "28P01")))
  }
}
