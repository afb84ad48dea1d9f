package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Cluster-bucketed semantic deduplication over an embedding column — the
  * SemDeDup recipe (Abbas et al., "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540): a k-means
  * coarse quantizer buckets the corpus, and near-duplicates are resolved
  * ONLY within a bucket, so the pair space is Σ|cell|² instead of n² —
  * the same inverted-file layout [[IVFIndex]] uses for ANN search, reused
  * here as the dedup blocking key.
  *
  * Duplicate rule (deterministic, replayable): a vector is a duplicate iff
  * some LOWER-id vector in the same cell has cosine ≥ tau — d1's
  * keep-first semantics lifted to embedding space. Lower-id wins so the
  * kept set is stable across layouts and re-runs (seeded k-means).
  *
  * Scale notes: the cell self-join is an equi-join on the cell id, never
  * all-pairs; at 100 TB cells are written as a partition column and each
  * cell dedups independently (embarrassingly parallel). Two guards bound
  * the worst case (the d2 df-cap idea applied to cluster occupancy):
  *
  *  1. '''Exact-value collapse''' (always on, provably flag-preserving):
  *     vectors are grouped by (cell, value) and only the min-id
  *     representative of each distinct value enters the pair join. Every
  *     non-representative is a duplicate by construction (its identical
  *     rep is a lower-id witness with cosine 1 ≥ tau, for any tau ≤
  *     1 − ulp), and a representative's flag over rep pairs equals its
  *     flag over all pairs: any witness v′ < r has a rep r′ ≤ v′ < r with
  *     the identical vector, so the rep pair (r′, r) carries the same
  *     cosine. This is what makes the DEGENERATE jumbo cell — millions of
  *     copies of one value, which no geometric split can separate —
  *     linear instead of quadratic. The "cosine 1" step assumes a NONZERO
  *     vector — cosine(0⃗, 0⃗) is undefined (NULL from the engine's
  *     try_divide kernel; NaN in plain float math), never ≥ tau, so
  *     duplicate all-zero vectors are NOT duplicates under the pair rule. Zero-norm vectors
  *     are therefore excluded from the collapse (each stays its own
  *     singleton representative), keeping the flags bit-identical to the
  *     brute-force pair replay even on corpora containing zero vectors.
  *  2. '''Occupancy cap + recursive re-split''' (`maxCell`): cells whose
  *     REPRESENTATIVE count exceeds the cap are re-split by a
  *     sub-quantizer trained inside the cell (seeded k-means, k sized
  *     from the overflow factor), recursively to `maxDepth`. Refined
  *     cells are the blocking key the pair join and the returned `cell`
  *     column use, so the flags stay exactly replayable against the
  *     returned assignment. Splitting a cell is a semantic refinement of
  *     the blocking key (standard SemDeDup behavior: a finer quantizer
  *     compares fewer pairs), not an approximation of this object's own
  *     contract — the contract IS "duplicate within the returned cell".
  */
object SemanticDedup {

  /** Every vector with its (refined) cell and duplicate flag:
    * (vec_id, cell, is_dup). The building block the tests replay
    * brute-force; [[dedup]] is the kept-corpus view.
    */
  def flagged(emb: DataFrame, nLists: Int, tau: Double,
      seed: Long = 42L, maxCell: Int = Int.MaxValue,
      maxDepth: Int = 2): DataFrame =
    flaggedFrom(IVFIndex.build(emb, nLists, seed), tau, seed, maxCell,
      maxDepth)

  /** [[flagged]] over a PINNED quantizer ([[IvfCentroids]] — the
    * PqCodebook serving discipline): same collapse → cap → pair-join
    * body, but the cell assignment is a broadcast argmin against an
    * offline-trained centroid artifact instead of a per-corpus k-means
    * fit. This is what makes the d8 registry entry oracle-replayable —
    * assignment, collapse, and the within-cell pair rule are all plain
    * SQL once the centroids are data. Per-corpus training stays the
    * first-class path ([[flagged]], SketchSpec's brute-force replays).
    */
  def flaggedPinned(emb: DataFrame, centroids: Array[(Int, Array[Double])],
      tau: Double, seed: Long = 42L, maxCell: Int = Int.MaxValue,
      maxDepth: Int = 2): DataFrame =
    flaggedFrom(IVFIndex.fromCentroids(emb, centroids), tau, seed, maxCell,
      maxDepth)

  private def flaggedFrom(idx: IVFIndex.Index, tau: Double, seed: Long,
      maxCell: Int, maxDepth: Int): DataFrame = {
    val l = idx.assigned.select(col("vec_id"), col("cell"), col("v"))
    // exact-value collapse: one representative per distinct vector value
    // per cell (identical values always share a cell — assignment is a
    // deterministic function of the value). Zero-norm vectors opt OUT of
    // the collapse (sk = own id → singleton group): their pairwise cosine
    // is NaN, so collapsing them would flag duplicates the pair rule
    // never flags (see scaladoc)
    val lk = l.withColumn("sk",
      when(exists(col("v"), x => x =!= lit(0.0)), lit(0L))
        .otherwise(col("vec_id")))
    val groups = lk.groupBy("cell", "v", "sk").agg(min("vec_id").as("rep_id"))
    val reps0 = groups.select(col("rep_id").as("vec_id"), col("cell"), col("v"))
    // pin the representative set: refine's census/per-cell driver loop and
    // the pair join's BOTH sides re-derive it otherwise (the groups
    // shuffle per scan). Block ownership follows the existing
    // caller-owns contract (CacheScope / the bench sweep)
    val reps = refine(reps0, maxCell, seed, maxDepth)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dups = reps.as("x").join(reps.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") > col("y.vec_id"))
      .filter(VectorOps.cosine(col("x.v"), col("y.v")) >= tau)
      .select(col("x.vec_id").as("rep_id")).distinct()
      .withColumn("rep_dup", lit(true))
    // build cache lifecycle: the assignment is read by both join sides —
    // the caller (bench isolation / a real deploy's cell-partitioned
    // write) owns dropping the block, same contract as s4's index
    lk.join(groups, Seq("cell", "v", "sk"))
      .select(col("vec_id"), col("rep_id"))
      .join(reps.select(col("vec_id").as("rep_id"), col("cell")), Seq("rep_id"))
      .join(dups, Seq("rep_id"), "left")
      .select(col("vec_id"), col("cell"),
        (col("vec_id") =!= col("rep_id") ||
          coalesce(col("rep_dup"), lit(false))).as("is_dup"))
  }

  /** The deduplicated corpus: ids that survive semantic dedup. */
  def dedup(emb: DataFrame, nLists: Int, tau: Double,
      seed: Long = 42L, maxCell: Int = Int.MaxValue,
      maxDepth: Int = 2): DataFrame =
    flagged(emb, nLists, tau, seed, maxCell, maxDepth)
      .filter(!col("is_dup"))
      .select("vec_id")

  /** [[dedup]] over a pinned quantizer — see [[flaggedPinned]]. */
  def dedupPinned(emb: DataFrame, centroids: Array[(Int, Array[Double])],
      tau: Double, seed: Long = 42L, maxCell: Int = Int.MaxValue,
      maxDepth: Int = 2): DataFrame =
    flaggedPinned(emb, centroids, tau, seed, maxCell, maxDepth)
      .filter(!col("is_dup"))
      .select("vec_id")

  /** Lloyd iterations for the batched sub-quantizer ([[refine]]). */
  private val RefineIters = 10

  /** Fixed-point scale for the exact centroid-mean aggregation: embedding
    * coordinates are O(1) doubles, so ×10¹² keeps ~12 significant
    * decimals and the per-(sub, pos) DECIMAL(38,0) sum has ~10¹³ rows of
    * headroom before precision-38 saturates.
    */
  private val FixedPointScale = 1e12

  /** Recursively re-split cells whose representative occupancy exceeds
    * `maxCell` — ALL oversized cells in one batched, seeded Lloyd's
    * k-means, not a driver loop of per-cell fits (the r12 scaling wart:
    * one KMeans.fit + assignment pass PER oversized cell serialized a
    * few hundred hot cells into a few hundred sequential Spark jobs at
    * skew; this version runs O(1) jobs per depth regardless of how many
    * cells overflow).
    *
    * The batch trick: every oversized cell's sub-problem shares each
    * pass — init ranks reps per cell by xxhash64(vec_id, cell + seed)
    * (per-cell seeding preserved: the ordering is a function of the
    * cell id and the seed) and takes the k_c hash-smallest as initial
    * centroids; each Lloyd iteration is one broadcast join of the
    * Σk_c-row centroid table on the cell key (a rep only ever competes
    * against its OWN cell's centroids) + an argmin via min(struct(d,
    * sub)), then one partial-agg recompute of centroid means. Means
    * aggregate in fixed-point DECIMAL(38,0) (×10¹²), not doubles —
    * exact integer sums are aggregation-order-free, so the refined
    * assignment is deterministic on any partition layout, which the
    * double-sum a distributed KMeans.fit does cannot promise.
    *
    * Sub-cell ids block-allocate past the current max (cell c's block is
    * [base_c, base_c + k_c)), so ids stay dense ints across depths.
    * `maxDepth` bounds the recursion when a cell resists splitting
    * (near-identical but distinct values), at which point the residual
    * is depth-bounded rather than unbounded-quadratic.
    */
  private def refine(reps: DataFrame, maxCell: Int, seed: Long,
      depth: Int): DataFrame = {
    if (maxCell == Int.MaxValue || depth <= 0) return reps
    // pin this level before the census: the iteration passes below
    // re-scan `reps` once per Lloyd step — uncached, each scan replays
    // the full upstream lineage (the groups shuffle plus any prior
    // refine unions). Caller-owns-block contract
    val pinned = reps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = pinned.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val over = sizes.filter(_._2 > maxCell).map(_._1).sorted
    if (over.isEmpty) return pinned
    val spark = reps.sparkSession
    import spark.implicits._
    // per-cell sub-quantizer size and a dense id block per cell
    var nextId = sizes.map(_._1).max + 1
    val plan = over.map { c =>
      val n = sizes.find(_._1 == c).get._2
      val k = math.min(16, math.max(2, math.ceil(n.toDouble / maxCell).toInt))
      val base = nextId; nextId += k
      (c, k, base)
    }.toSeq
    val planDf = broadcast(plan.toDF("cell", "k_c", "base"))
    val untouched = pinned.filter(!col("cell").isInCollection(over.toSeq))
    val overdf = pinned.filter(col("cell").isInCollection(over.toSeq))
    // seeded init: the k_c hash-smallest reps of each cell, their values
    // taken as the initial centroids (one job for ALL cells)
    val hw = Window.partitionBy("cell")
      .orderBy(xxhash64(col("vec_id"), col("cell") + lit(seed)), col("vec_id"))
    var cent: Array[(Int, Int, Seq[Double])] = overdf.join(planDf, "cell")
      .withColumn("rn", row_number().over(hw))
      .filter(col("rn") <= col("k_c"))
      .select(col("cell"), (col("base") + col("rn") - 1).as("sub"), col("v"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def assigned(cs: Array[(Int, Int, Seq[Double])]): DataFrame = {
      val centDf = broadcast(cs.toSeq.toDF("cell", "sub", "cv"))
      overdf.join(centDf, "cell")
        .groupBy(col("vec_id"), col("cell"), col("v"))
        .agg(min(struct(VectorOps.l2sq(col("v"), col("cv")).as("d"),
          col("sub").as("sub"))).as("m"))
        .select(col("vec_id"), col("m.sub").as("sub"), col("v"))
    }
    for (_ <- 1 to RefineIters) {
      val subCell = cent.map(t => t._2 -> t._1).toMap
      cent = assigned(cent)
        .select(col("sub"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("sub", "pos")
        .agg(sum((col("x") * FixedPointScale).cast(d38)).as("sx"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("pos"),
          ((col("sx") / col("n")).cast("double") / FixedPointScale).as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).toArray
        .map { case (sub, xs) =>
          (subCell(sub), sub, xs.sortBy(_._2).map(_._3).toSeq)
        }
        .sortBy(_._2)
      // subs that lost every rep drop out of the table (standard Lloyd's
      // empty-cluster shrink; the id block just stays sparse)
    }
    val splits = assigned(cent)
      .select(col("vec_id"), col("sub").as("cell"), col("v"))
    refine(untouched.unionAll(splits), maxCell, seed, depth - 1)
  }
}
