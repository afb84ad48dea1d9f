package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, DocFixtures}

/** Dev scratch probe (not part of the driver contract) — current focus:
  * the d11-family pair→text attachment cost (r18 task 4).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s   rows=$n")
    }
    (1 to 3).foreach { i =>
      var d: org.apache.spark.sql.DataFrame = null
      var cands: org.apache.spark.sql.DataFrame = null
      time(s"fixture-ckpt-$i") {
        d = DocFixtures.docsNear(spark, dir).select("doc_id", "text").localCheckpoint()
        d.count()
      }
      time(s"cands-pipeline-$i") {
        cands = Dedup.ngramJaccardPairs(d, n = 7, threshold = 0.0,
          dfMax = Some(1000))
        cands.count()
      }
      time(s"attach+lev-$i")(Dedup.attachPairTexts(cands, d)
        .select(levenshtein(col("t1"), col("t2")).as("lev"))
        .filter(col("lev") >= 0).count())
      time(s"full-registry-d11-$i")(SparkEntry.queries("d11_edit_verify")(spark, dir)
        .queryExecution.toRdd.count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
