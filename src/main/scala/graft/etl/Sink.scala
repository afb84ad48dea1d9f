package graft.etl

import org.apache.spark.sql.DataFrame

/** Parquet lake sink with partition layout control — the write path that
  * matters at 100 TB (the JDBC path in [[Load]] covers the reference's
  * warehouse sink).
  *
  * `repartition(partitionCols)` before `partitionBy` is the small-files
  * guard: without it every task writes a file into every partition
  * directory (tasks × partitions files); with it each partition value
  * lands in one task → one right-sized file per partition value. For
  * very large partition values add a salt column to split them, sized so
  * files land near the 128 MB parquet sweet spot. Readers get partition
  * pruning for free (`PartitionFilters` in the scan).
  */
object Sink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    writePartitioned(df, path, partitionCols, Nil)

  /** [[writePartitioned]] with parquet bloom filters on point-probe
    * columns — the cheap at-rest win for fingerprint/key lookups
    * (d7-style incremental dedup probes a standing corpus by
    * fingerprint; min/max row-group stats are useless on a hash column
    * because every row group spans the full hash range, while a bloom
    * filter answers "this row group cannot contain fp" in one footer
    * read). Parquet writes one filter per row group per listed column;
    * readers with an equality predicate consult it and SKIP row groups
    * whose filter misses (parquet-mr's bloom row-group filtering,
    * on by default under Spark's parquet filter pushdown). `expectedNdv`
    * sizes the filter bits (FPP ~1% at the stated cardinality); 0 keeps
    * parquet's default sizing.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      bloomCols: Seq[String], expectedNdv: Long = 0L): Unit = {
    val base = df.repartition(partitionCols.map(df.col): _*)
      .write
      .mode("overwrite")
    val withBloom = bloomCols.foldLeft(base) { (w, c) =>
      val on = w.option(s"parquet.bloom.filter.enabled#$c", "true")
      if (expectedNdv > 0)
        on.option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
      else on
    }
    withBloom.partitionBy(partitionCols: _*).parquet(path)
  }

  /** Bucketed managed table: pre-shuffles the data into `nBuckets` by the
    * join/aggregation key at WRITE time, so every later equi-join or
    * groupBy on that key between co-bucketed tables runs with ZERO
    * exchanges — this is the cluster answer to the lineitem⋈orders
    * fact-fact join (ARCHITECTURE.md "Joins"). Bucketing requires the
    * table catalog (`saveAsTable`), not a bare path.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Z-ordered layout: range-partition + sort by the Morton value of TWO
    * keys, so parquet min/max row-group stats prune scans filtered on
    * EITHER column (partitionBy prunes one key coarsely, bucketBy serves
    * one join key; this is the several-predicates-at-once tool — the
    * lakehouse OPTIMIZE/CLUSTER BY layout). Keys must already sit in the
    * interleave's [0, 2^bits) domain — clamp/offset at the call site.
    * `repartitionByRange` makes files cover disjoint z ranges;
    * `sortWithinPartitions` orders row groups inside each file; the
    * projection dropping the helper column preserves that order.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
      nFiles: Int, bits: Int = 10): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z",
        graft.functions.ZOrder.zValue(col(a), col(b), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Dynamic partition overwrite — the incremental-reload write mode:
    * `mode("overwrite")` with STATIC overwrite (Spark's default) deletes
    * the WHOLE table root before writing, so reloading one day's
    * partition would silently drop every other day. Dynamic mode
    * replaces only the partitions present in this DataFrame and leaves
    * all others byte-identical on disk (asserted in SinkSpec) — the
    * partition-level sibling of the a18/a19 incremental maintenance
    * story, and the correct idempotent re-run semantics for a periodic
    * ingest: re-writing yesterday's partition is a no-op for the rest of
    * the lake. The mode is passed as a WRITER option, not a session conf:
    * the option scopes "dynamic" to this one write, so a concurrent
    * writer on the same SparkSession can never race a session-global
    * set/restore window into the wrong overwrite mode (its own
    * static-overwrite expectations stay intact throughout).
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-file compaction — lake maintenance, not a query: streaming
    * micro-batches and over-parallel writers fragment a table into
    * thousands of KB-scale files, and at 100 TB the scan then pays a
    * task-schedule + footer-read + open per file (plus NameNode/object-
    * store listing pressure) that dwarfs the data read. Rewrite the
    * table sized by ROWS-PER-FILE derived from a target byte size and a
    * measured average row width — sizing by file COUNT would need the
    * total size up front and drifts as the table grows. Round-robin
    * `repartition(n)` (not coalesce: coalesce merges ADJACENT partitions
    * without a shuffle, so a skewed source keeps its skew and one output
    * file can still be giant; the rewrite is one full shuffle by design,
    * amortized over every later scan). `maxRecordsPerFile` caps gross
    * overfill per task — with 10% headroom over the target, so the
    * few-row imbalance round-robin leaves between tasks doesn't split a
    * spurious sliver file off an otherwise-full one. Returns the file
    * count written.
    */
  def compact(df: DataFrame, path: String, targetBytesPerFile: Long,
      avgRowBytes: Long): Long = {
    require(targetBytesPerFile > 0 && avgRowBytes > 0)
    val rowsPerFile = math.max(1L, targetBytesPerFile / avgRowBytes)
    val nRows = df.count()
    val nFiles = math.max(1L, (nRows + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartition(nFiles)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile + rowsPerFile / 10 + 1)
      .parquet(path)
    nFiles.toLong
  }
}
