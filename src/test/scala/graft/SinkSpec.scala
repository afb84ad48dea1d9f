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

  test("z-ordered write clusters BOTH key dimensions per file") {
    val out = Files.createTempDirectory("graft_zorder_").toString
    val li = graft.etl.Tables.table(spark, sf, "lineitem")
      .select(pmod(col("l_partkey"), lit(1024L)).as("pk_low"),
        least(greatest(floor(datediff(to_date(col("l_shipdate")),
          lit(java.sql.Date.valueOf("1995-01-01"))) / 4), lit(0)), lit(1023))
          .cast("long").as("day_off"),
        col("l_extendedprice"))
    val nFiles = 8
    Sink.writeZOrdered(li, out, "pk_low", "day_off", nFiles)
    // per-file bounding boxes in (pk_low, day_off) space: a z-ordered
    // layout confines each file to a small rectangle in BOTH dimensions,
    // which is exactly what parquet min/max row-group pruning consumes.
    // A single-column sort would cluster ONE dimension and leave the
    // other spanning its full range (normalized area ≈ width of the z
    // slice ≈ 1/nFiles per file only when both dims shrink together).
    val boxes = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("pk_low").as("a0"), max("pk_low").as("a1"),
        min("day_off").as("b0"), max("day_off").as("b1"))
      .collect()
    assert(boxes.length == nFiles)
    val global = li.agg(max("pk_low"), max("day_off")).head()
    val (ga, gb) = (global.getLong(0) + 1.0, global.getLong(1) + 1.0)
    val areas = boxes.map { r =>
      (r.getLong(2) - r.getLong(1) + 1.0) * (r.getLong(4) - r.getLong(3) + 1.0) /
        (ga * gb)
    }
    val mean = areas.sum / areas.length
    info(f"mean normalized per-file bounding box: $mean%.3f " +
      f"(worst ${areas.max}%.3f; unclustered = 1.0, ideal ≈ ${1.0 / nFiles}%.3f)")
    // 8 z-slices ⇒ each file should cover ~1/8 of the plane; allow slack
    // for the slice that straddles a Morton quadrant boundary
    assert(mean < 0.40, f"files are not 2-D clustered (mean area $mean%.3f)")
  }

  test("dynamic partition overwrite touches only the delta's partitions") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("dynover").toString
    val ev = graft.etl.Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
    graft.etl.Sink.overwritePartitions(ev, tmp, Seq("event_type"))
    def listing(t: String): Map[String, Long] = {
      val d = new java.io.File(s"$tmp/event_type=$t")
      d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    val types = ev.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted
    assert(types.length >= 3)
    val target = types.head
    val before = (types.toSet - target).map(t => t -> listing(t)).toMap
    // reload ONE partition with shifted values — the periodic-ingest
    // re-run shape
    val delta = ev.filter(col("event_type") === target)
      .withColumn("value", col("value") + 1000.0)
    graft.etl.Sink.overwritePartitions(delta, tmp, Seq("event_type"))
    // untouched partitions: identical files (names AND mtimes — nothing
    // was rewritten, not merely equal content)
    for (t <- types.toSet - target)
      assert(listing(t) == before(t), s"partition $t was rewritten")
    // target partition replaced; everything else byte-identical rows
    val back = spark.read.parquet(tmp)
    assert(back.filter(col("event_type") === target)
      .agg(min("value")).head().getDouble(0) >= 1000.0)
    assert(back.count() == ev.count())
    assert(back.filter(col("event_type") =!= target)
      .select("event_id", "value")
      .except(ev.filter(col("event_type") =!= target)
        .select("event_id", "value")).isEmpty)
    // and the session conf was restored (default = static)
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_.equalsIgnoreCase("static")))
  }

  test("bloom-filtered write: filter present on the fingerprint column, " +
      "membership answers row-group skips") {
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("graft_bloom_").toString
    // d7's at-rest shape: a fingerprinted corpus a later ingest probes by
    // exact fingerprint. min/max stats can't prune a hash column (every
    // row group spans the hash range); the bloom filter is the primitive
    // that can.
    val docs = graft.etl.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"))
    Sink.writePartitioned(docs, out, Seq("source"), bloomCols = Seq("fp"),
      expectedNdv = 1000L)
    val srcDir = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("source=")).head
    val file = srcDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sessionState.newHadoopConf()))
    try {
      val block = reader.getRowGroups.get(0)
      val byName = block.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      // filter metadata exists for fp and ONLY fp (offset -1 = absent)
      assert(byName("fp").getBloomFilterOffset >= 0,
        "no bloom filter written for fp")
      assert(byName("doc_id").getBloomFilterOffset < 0,
        "bloom filter leaked onto a column that didn't ask for one")
      val bf = reader.getBloomFilterDataReader(block)
        .readBloomFilter(byName("fp"))
      assert(bf != null)
      // findHash IS the reader's row-group skip decision under a pushed
      // equality predicate: no false negatives (every present fp hits),
      // and absent probes miss (≈1% FPP) → the row group is skipped.
      val src = srcDir.getName.stripPrefix("source=")
      val present = docs.filter(col("source") === src)
        .select("fp").limit(20).collect().map(_.getString(0))
      assert(present.nonEmpty)
      present.foreach { v =>
        assert(bf.findHash(bf.hash(
          org.apache.parquet.io.api.Binary.fromString(v))),
          s"present fingerprint $v missed — bloom filters must not " +
            "have false negatives")
      }
      val misses = (0 until 20).count { i =>
        !bf.findHash(bf.hash(org.apache.parquet.io.api.Binary.fromString(
          s"definitely_absent_fingerprint_$i")))
      }
      assert(misses >= 18,
        s"only $misses/20 absent probes missed — filter too saturated " +
          "to ever skip a row group")
    } finally reader.close()
    // and the probe itself stays correct through the Spark scan path
    val probeFp = docs.select("fp").head().getString(0)
    assert(spark.read.parquet(out).filter(col("fp") === probeFp).count() ==
      docs.filter(col("fp") === probeFp).count())
  }

  test("compaction rewrites a fragmented table into evenly sized files") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val li = graft.etl.Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    // fragment: 64 round-robin writers over a ~6k-row table = KB files
    li.repartition(64).write.mode("overwrite").parquet(s"$tmp/frag")
    val frag = spark.read.parquet(s"$tmp/frag")
    def files(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles.toSeq
        .filter(f => f.getName.endsWith(".parquet"))
    assert(files(s"$tmp/frag").size == 64)
    val total = frag.count()
    // target ~4 files via the rows-per-file derivation (width from the
    // fragmented copy: total bytes / total rows — what a maintenance job
    // measures before rewriting)
    val fragBytes = files(s"$tmp/frag").map(_.length).sum
    val avgRow = math.max(1L, fragBytes / total) // fragmented width is
    // footer-dominated, so derive the target size from it too: aim for
    // total/4 rows per file rather than a fixed byte constant
    val nFiles = graft.etl.Sink.compact(frag, s"$tmp/out",
      targetBytesPerFile = avgRow * (total / 4), avgRowBytes = avgRow)
    val out = files(s"$tmp/out")
    assert(out.size == nFiles && nFiles <= 5,
      s"expected ~4 compacted files, got ${out.size} (returned $nFiles): " +
        "a split means maxRecordsPerFile headroom no longer absorbs " +
        "round-robin imbalance")
    // same rows, and no residual skew: every file within 2x of the mean
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == total)
    assert(back.select("l_orderkey", "l_linenumber").except(
      li.select("l_orderkey", "l_linenumber")).isEmpty)
    val sizes = out.map(_.length.toDouble)
    assert(sizes.max / (sizes.sum / sizes.size) < 2.0,
      s"compacted files skewed: ${sizes.sorted.mkString(", ")}")
  }

  test("schema evolution: mergeSchema unions old and new files, null-backfills, prunes when off") {
    // the lake-evolution contract: v2 of a pipeline adds a column; old
    // files must stay readable beside new ones with the added column
    // null for historical rows — and WITHOUT mergeSchema the reader
    // keeps the cheap single-footer schema (old files' view of v2 rows)
    val sess = spark
    import sess.implicits._
    val tmp = Files.createTempDirectory("graft_evo_").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$tmp/t")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "name", "score")
      .write.mode("append").parquet(s"$tmp/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$tmp/t")
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30L)), (4L, "d", Some(40L))))
    // evolved column prunes at the scan like any other
    val plan = merged.select("id", "score").queryExecution.executedPlan
      .toString
    assert(plan.contains("ReadSchema: struct<id:bigint,score:bigint>"),
      s"evolved-column pruning missing:\n${plan.take(400)}")
    // rows survive a non-merged read too (schema picked from one footer);
    // the contract a pipeline relies on is count-stability, not columns
    assert(spark.read.parquet(s"$tmp/t").count() == 4)
  }
}
