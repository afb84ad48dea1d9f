package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DocFixtures, MinHashLSH, SimHash, Similarity}

/** Semantic coverage for the hash-sketch operators that have no DuckDB
  * oracle (xxhash64-based): recall of injected near-duplicates, estimate
  * accuracy vs. the exact-Jaccard path, and ANN correctness vs. brute
  * force.
  */
class SketchSpec extends SparkSpec {

  private val injectedPairs: Set[(Long, Long)] =
    (0L until 500L by 10).map(id => (id, id + 1000000)).toSet

  test("MinHash-LSH finds injected near-copies with accurate estimates") {
    val near = DocFixtures.docsNear(spark, sf)
    val exact = Dedup.ngramJaccardPairs(near, n = 7, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val est = MinHashLSH.nearDupPairs(near)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val found = injectedPairs.count(est.contains)
    assert(found >= (injectedPairs.size * 0.9).toInt,
      s"minhash recall on injected pairs: $found/${injectedPairs.size}")
    // estimates within 0.25 of exact Jaccard where both scored the pair
    est.keys.filter(exact.contains).foreach { k =>
      assert(math.abs(est(k) - exact(k)) <= 0.25, s"pair $k est=${est(k)} exact=${exact(k)}")
    }
  }

  test("SimHash puts injected near-copies within Hamming 3") {
    val got = SimHash.nearDupPairs(DocFixtures.docsNear(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = injectedPairs.count(got.contains)
    // one dropped word among ~hundreds of tokens rarely flips >3 bits
    assert(found >= (injectedPairs.size * 0.7).toInt,
      s"simhash recall on injected pairs: $found/${injectedPairs.size}")
  }

  test("embedding dup detection recovers all injected vector copies") {
    val pairs = Similarity.embeddingDupPairs(DocFixtures.embDup(spark, sf),
        threshold = 0.999, numPlanes = 12, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 500L by 10).map(id => (id, id + 100000)).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected -- pairs}")
  }

  test("bucketed kNN finds every injected duplicate and keeps general recall") {
    val emb = graft.etl.Tables.table(spark, sf, "embeddings")
    val exact = Similarity.knnJoinExact(emb, k = 3).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val approx = Similarity.knnJoinBucketed(emb, k = 3, numPlanes = 4, dim = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val recall = exact.map { case (id, nbrs) =>
      approx.getOrElse(id, Set.empty[Long]).intersect(nbrs).size.toDouble / nbrs.size
    }.sum / exact.size
    info(f"bucketed kNN recall@3 vs exact: $recall%.3f")
    assert(recall >= 0.35, f"bucketed kNN recall too low: $recall%.3f")
    // recall on exact duplicates is 1 by construction (identical sign bucket)
    val dup = Similarity.knnJoinBucketed(DocFixtures.embDup(spark, sf),
        k = 1, numPlanes = 8, dim = 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 500L by 10).foreach { id =>
      assert(dup(id) == id + 100000, s"dup partner missed for $id")
      assert(dup(id + 100000) == id, s"dup partner missed for ${id + 100000}")
    }
  }

  test("bucketed kNN plan is equi-join only — nothing quadratic") {
    val emb = graft.etl.Tables.table(spark, sf, "embeddings")
    val plan = Similarity.knnJoinBucketed(emb, k = 3, numPlanes = 4, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(5).mkString("\n"))
  }

  test("ANN cosines are exact for returned candidates and bucket-consistent") {
    val emb = graft.etl.Tables.table(spark, sf, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.annTopK(emb, 0L, 10, numPlanes = 4, dim = 64).collect()
    assert(ann.length == 10)
    ann.foreach { r =>
      val (id, cos) = (r.getLong(0), r.getDouble(1))
      assert(math.abs(cos - brute(id)) < 1e-12, s"vec $id cosine mismatch")
    }
    // and the ANN top-1 should rank well in the exact ordering
    val annTop = ann.maxBy(_.getDouble(1)).getLong(0)
    val bruteRank = brute.toSeq.sortBy(-_._2).indexWhere(_._1 == annTop)
    assert(bruteRank >= 0 && bruteRank < 100,
      s"ANN best hit ranks $bruteRank in exact ordering")
  }
}
