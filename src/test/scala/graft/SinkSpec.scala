package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Pipelines, Sink}

class SinkSpec extends SparkSpec {

  test("partitioned write prunes partitions on read") {
    val out = Files.createTempDirectory("graft_sink_").toString
    val cs = Pipelines.cleanSales(spark, sf)
    Sink.writePartitioned(cs, out, Seq("month"))
    // layout: one directory per month, one file per partition value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("month="))
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(out)
    val aMonth = dirs.head.stripPrefix("month=")
    val filtered = back.filter(col("month") === aMonth)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"),
      s"no partition pruning in plan:\n${plan.take(500)}")
    assert(filtered.count() ==
      cs.filter(col("month") === aMonth).count())
    // round trip preserves rows
    assert(back.count() == cs.count())
  }

  test("co-bucketed tables join without a shuffle") {
    Seq("li_b", "ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val li = graft.etl.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.etl.Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    Sink.writeBucketed(li, "li_b", "l_orderkey", 8)
    Sink.writeBucketed(ord, "ord_b", "o_orderkey", 8)
    // force the at-scale plan shape: at 100 TB neither fact side
    // broadcasts, which is exactly when bucketing pays
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
