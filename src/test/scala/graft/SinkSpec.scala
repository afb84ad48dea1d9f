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
}
