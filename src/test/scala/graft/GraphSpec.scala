package graft

import org.apache.spark.sql.functions._

/** The g* graph family. g1–g3 are hash-oracled against DuckDB (exact
  * longs); this spec pins the triangle ALGORITHM — orientation +
  * closure — on fixtures small enough to count by hand, plus a
  * brute-force cross-check on a seeded random graph, because the
  * oracle replays the same degree-ordered algorithm and could share a
  * bug with it.
  */
class GraphSpec extends SparkSpec {

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sess = spark
    import sess.implicits._
    GraphQueries.triangleCounts(edges.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("g2: hand-computed fixtures") {
    // a single triangle
    assert(tri(Seq((1L, 2L), (1L, 3L), (2L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // K4: each vertex sits in C(3,2) = 3 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a path has no triangles → empty output
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // bowtie: two triangles sharing vertex 3
    assert(tri(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L),
      (4L, 5L))) == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    // star (hub + leaves, no leaf-leaf edges): triangle-free whatever
    // the skew — the orientation points every edge INTO the hub
    assert(tri((2L to 8L).map(l => (1L, l))).isEmpty)
  }

  test("g2: equals brute-force enumeration on a seeded random graph") {
    // deterministic pseudo-random graph on 30 nodes: edge (i, j) present
    // iff a hash bit fires — dense enough for hundreds of triangles
    val edges = for {
      i <- 1L to 30L; j <- (i + 1) to 30L
      if ((i * 2654435761L + j * 40503L) % 97) < 30
    } yield (i, j)
    val es = edges.toSet
    val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- 1L to 30L; j <- (i + 1) to 30L; k <- (j + 1) to 30L
      if es((i, j)) && es((j, k)) && es((i, k))
    } { brute(i) += 1; brute(j) += 1; brute(k) += 1 }
    assert(brute.nonEmpty, "fixture degenerated — no triangles to check")
    assert(tri(edges) == brute.toMap)
  }

  test("g3: predictions are non-adjacent pairs with real shared neighbors") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("g3_common_neighbors")(spark, dir).collect()
    assert(got.nonEmpty)
    // spot-invariants against g1: n_common can never exceed the smaller
    // endpoint degree
    val deg = SparkEntry.queries("g1_degree_profile")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (r <- got.take(200)) {
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(c <= math.min(deg(a), deg(b)), s"pair ($a,$b) impossible count")
    }
  }
}
