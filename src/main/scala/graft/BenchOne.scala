package graft
import org.apache.spark.sql.SparkSession

/** Time a single registered query in isolation (same session config as
  * [[Bench]]): `runMain graft.BenchOne <name> [iters] [sfDir]`. Prints one
  * line per iteration — iteration 1 includes codegen/JIT cold-start, later
  * ones show the warm cost, so a cold-vs-warm gap localizes compile-time
  * versus plan-time regressions without a full 92-query sweep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [iters] [sfDir]"))
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    // shared harness-contract default (r14 ADVICE: this file carried its
    // own copy of the literal — the exact drift class behind the
    // local[4] phantom)
    val cpus = Bench.resolvedCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"[bench-one] master=local[$cpus] box_cores=" +
      Runtime.getRuntime.availableProcessors)
    GraftExtensions.install(spark)
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      // protocol v2 (r15): run the query's own plan — see Bench.scala
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"$name iter=$i ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
