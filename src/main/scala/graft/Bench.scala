package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: prime JIT, codegen caches, the parquet reader, AND
    // the streaming machinery (events staging + state-store engine init —
    // otherwise the first st* query pays one-time setup inside its
    // measurement) on representative query shapes before the measured pass.
    Seq("q1_sales_summary", "s1_cosine_topk", "t1_token_count",
        "c5_source_profile", "st5_stream_stateful").foreach { q =>
      try { SparkEntry.queries(q)(spark, sfDir).count() }
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    println(renderJson(results, sfDir))
    spark.stop()
  }

  /** The driver-contract output line. Totals LAST and 3-decimal
    * per-query values (sorted by name): the driver stores the TAIL of
    * the line (r4 evidence: a totals-first line had its headline
    * truncated off the FRONT), so the headline metric/value/n_queries
    * go after the queries map — a tail-retention truncation keeps them.
    * Parseability is pinned by a test (a malformed line silently zeroes
    * the round's bench record).
    */
  def renderJson(results: Seq[(String, Double)], sfDir: String): String = {
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    s"""{"queries":$qs,"sf":"$sfDir","metric":"total","unit":"sec","n_queries":${results.size},"value":${f(total)}}"""
  }
}
