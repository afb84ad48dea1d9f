package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary induction — the tokenizer-training step
  * of an LLM data pipeline (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units", ACL 2016, implemented from the
  * paper's algorithm description): start from characters, repeatedly
  * merge the most frequent adjacent symbol pair, weighting each word's
  * pairs by corpus frequency.
  *
  * The 100 TB story is the word table: after ONE (word → count)
  * partial-agg shuffle over the corpus, every training iteration reads
  * the DISTINCT-WORD table only — bounded by vocabulary size,
  * independent of corpus row count. That is how production BPE trainers
  * scale: count words distributed, learn the merge table on the counts.
  * Each iteration is a small (l, r) pair-count shuffle over the vocab
  * table, a TakeOrdered(1) argmax, and a narrow per-word fold — the
  * driver holds exactly one row per iteration (the learned merge),
  * never data.
  *
  * Determinism: the argmax tiebreak is pinned (weight desc, then left,
  * then right lexicographically — Spark's UTF8String ordering equals
  * Java String compareTo on the plan-literal symbols involved), and
  * merge application is the greedy left-to-right fold over each word's
  * own symbol array: engine- and layout-independent, replayed
  * verbatim by BpeSpec's plain-Scala reference implementation at two
  * scales. A merged symbol can never re-trigger as the LEFT of the
  * same rule inside one pass (merged = l+r ≠ l since r is non-empty),
  * so the fold IS the greedy non-overlapping scan ("aaa" under (a,a)
  * → ["aa","a"], the standard semantics).
  */
object BpeTrainer {

  /** Learned merge table.
    *
    * @param docs      corpus with a `text` column
    * @param numMerges merge rules to learn (stops early if no adjacent
    *                  pair occurs at least twice)
    * @return (rank, left, right, merged, weight), rank 1-based in learn
    *         order
    */
  def trainMerges(docs: DataFrame, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    // the ONLY corpus-sized pass: word frequencies, then chars
    var words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(split(col("word"), "").as("syms"), col("cnt"))
      .localCheckpoint()

    val learned = ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = words
        .select(col("cnt"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("w") < 2L) exhausted = true
      else {
        val (l, r, w) = (top(0).getAs[String]("l"),
          top(0).getAs[String]("r"), top(0).getAs[Long]("w"))
        val merged = l + r
        learned += ((rank, l, r, merged, w))
        // greedy left-to-right application as a per-word fold; lineage
        // truncated per round (Clusters' device — on a real cluster
        // prefer checkpoint() so a lost executor doesn't replay rounds)
        words = words.withColumn("syms",
          aggregate(col("syms"),
            array().cast(ArrayType(StringType)),
            (acc, s) =>
              when((size(acc) > 0) &&
                  (element_at(acc, -1) === lit(l)) && (s === lit(r)),
                concat(slice(acc, lit(1), size(acc) - 1),
                  array(lit(merged))))
                .otherwise(concat(acc, array(s)))))
          .localCheckpoint()
        rank += 1
      }
    }

    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("weight", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.toSeq.map(m => Row(m._1.toLong, m._2, m._3, m._4, m._5)), 1),
      schema)
  }

  /** Plain-Scala reference trainer over a collected word-count table —
    * BpeSpec's independent replay of the iterative logic (the Spark side
    * is compared against this EXACTLY at sf0.001 and sf0.01).
    */
  def referenceMerges(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val pairW = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairW((syms(i), syms(i + 1))) =
          pairW.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val best = pairW.toSeq
        .sortBy { case ((l, r), w) => (-w, l, r) }.headOption
      best match {
        case Some(((l, r), w)) if w >= 2L =>
          val merged = l + r
          out += ((rank, l, r, merged, w))
          words = words.map { case (syms, c) =>
            val acc = ArrayBuffer[String]()
            for (s <- syms) {
              if (acc.nonEmpty && acc.last == l && s == r) {
                acc.remove(acc.length - 1); acc += merged
              } else acc += s
            }
            (acc.toVector, c)
          }
          rank += 1
        case _ => exhausted = true
      }
    }
    out.toSeq
  }
}
