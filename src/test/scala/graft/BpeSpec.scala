package graft

import org.apache.spark.sql.functions._

import graft.ext.{BpeTrainer, TextAnalysis}

/** BPE vocabulary induction — the t20 correctness story. No SQL oracle
  * exists (iterative argmax/merge is not single-statement expressible),
  * so the gate is an EXACT replay: collect the word-frequency table the
  * Spark trainer starts from and re-run the training with
  * [[BpeTrainer.referenceMerges]], an independent plain-Scala
  * implementation — every learned (rank, left, right, merged, weight)
  * row must match at both correctness scales.
  */
class BpeSpec extends SparkSpec {

  private def wordCounts(dir: String): Seq[(String, Long)] =
    graft.etl.Tables.table(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("t20: Spark merges equal the plain-Scala reference at sf0.001 AND sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = BpeTrainer
        .trainMerges(
          graft.etl.Tables.table(spark, dir, "documents").select("text"), 12)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      val want = BpeTrainer.referenceMerges(wordCounts(dir), 12)
      assert(got == want, s"dir=$dir")
      assert(got.size == 12, s"dir=$dir learned only ${got.size} merges")
    }
  }

  test("t20 property: Spark trainer equals the reference on random corpora") {
    // ScalaCheck-generated corpora over a 4-letter alphabet hit the merge
    // paths the fixed fixture cannot: single-char words (no pairs),
    // heavy weight ties (the (w desc, l, r) tiebreak), self-overlapping
    // runs ("aaaa"), and early exhaustion (best weight < 2). A fixed
    // seed keeps the gate deterministic; 5 cases × a full Spark train
    // keeps it affordable. On failure ScalaCheck shrinks to a minimal
    // corpus — a far better repro than a fixture diff.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sess = spark
    import sess.implicits._
    val genWord = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val genCorpus = Gen.nonEmptyListOf(genWord).map(_.take(40))
    val prop = Prop.forAll(genCorpus) { words =>
      val df = words.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
      val got = BpeTrainer.trainMerges(df, 6).orderBy("rank").collect()
        .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      val counts = words.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      got == BpeTrainer.referenceMerges(counts, 6)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(5)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("t20: greedy fold semantics — 'aaa' under (a,a) yields [aa, a]") {
    // the non-overlapping scan pinned as a unit case: a merged symbol
    // must not re-trigger as the LEFT of the same rule within one pass
    val ref = BpeTrainer.referenceMerges(Seq(("aaa", 5L)), 1)
    assert(ref == Seq((1, "a", "a", "aa", 10L)))
    val sess = spark
    import sess.implicits._
    val df = Seq("aaa aaa aaa aaa aaa").toDF("text")
    val m = BpeTrainer.trainMerges(df, 2).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // merge 1: (a,a) weight 10 (two per word × 5 words, greedy counts
    // overlapping pairs — 2 of the 2 adjacencies); merge 2: (aa,a) —
    // the leftover single 'a' after the greedy pass
    assert(m.head == ((1L, "a", "a", "aa", 10L)))
    assert(m(1) == ((2L, "aa", "a", "aaa", 5L)))
  }
}
