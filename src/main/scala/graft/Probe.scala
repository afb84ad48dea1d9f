package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, DocFixtures, MinHashLSH}
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
    val dir = "/root/testdata/sf0.1"
    if (args.contains("explain")) {
      Seq("q1_sales_summary", "j2_fact_dim_join", "p1_total_price", "o2_topk").foreach { q =>
        println(s"===== $q =====")
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
      }
      spark.stop(); return
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s   rows=$n")
    }
    val near = DocFixtures.docsNear(spark, dir)
    time("docsNear.count")(near.count())
    val toks = near.select(col("doc_id"), graft.ext.TextAnalysis.tokens(col("text")).as("t"))
    time("tokenize")(toks.count())
    time("shingles-expr")(near.select(col("doc_id"), graft.ext.TextAnalysis.tokens(col("text")).as("toks")).select(explode(Dedup.shingles(col("toks"), 7))).count())
    val idx = Dedup.shingleIndex(near, 7)
    time("shingleIndex")(idx.count())
    time("sizes")(idx.groupBy("doc_id").count().count())
    val a = idx.as("a"); val b = idx.as("b")
    time("inter-join")(a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id")).count().count())
    time("d2-full")(Dedup.ngramJaccardPairs(near, 7, 0.5).count())
    time("minhash-sigs")(MinHashLSH.signatures(near, 7, 32).count())
    time("d3-full")(MinHashLSH.nearDupPairs(near).count())
    spark.stop()
  }
}
