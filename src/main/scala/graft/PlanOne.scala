package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): dump `explain("formatted")`
  * for NAMED registry queries — the raw material for the r18 optimization
  * round's `plans/r18/<query>_{before,after}.txt` evidence files. Run:
  * `sbt "runMain graft.PlanOne <outDir> <suffix> <query> [query…]"`,
  * e.g. `sbt "runMain graft.PlanOne plans/r18 before d11b_edit_verify_banded"`.
  * Uses the Bench session shape (local[cpus], shuffle.partitions=cpus) so
  * the dumped plan is the one the bench actually executes, not PlanDump's
  * local[4] showcase shape. sfDir via SPARK_GRAFT_SF_DIR (default sf0.01 —
  * plan SHAPE is scale-invariant; the fixtures only size AQE estimates).
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanOne <outDir> <suffix> <query>…")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = Bench.resolvedCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode) +
        (if (sys.env.contains("GRAFT_PLAN_LOGICAL"))
           "\n== Optimized Logical ==\n" +
             df.queryExecution.optimizedPlan.treeString
         else "")
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
