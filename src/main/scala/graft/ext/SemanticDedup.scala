package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
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
      maxDepth: Int = 2): DataFrame = {
    val idx = IVFIndex.build(emb, nLists, seed)
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

  /** Recursively re-split cells whose representative occupancy exceeds
    * `maxCell`: each oversized cell trains its own sub-quantizer (seeded
    * per cell for determinism) and its reps re-assign to the nearest
    * sub-centroid. Cell ids for sub-cells are allocated past the current
    * max, so ids stay dense ints across depths. Oversized cells are the
    * pathology, not the norm — the per-cell driver loop (a k-means fit
    * and one assignment pass each) touches only them; `maxDepth` bounds
    * the recursion when a cell resists splitting (near-identical but
    * distinct values), at which point the residual is depth-bounded
    * rather than unbounded-quadratic.
    */
  private def refine(reps: DataFrame, maxCell: Int, seed: Long,
      depth: Int): DataFrame = {
    if (maxCell == Int.MaxValue || depth <= 0) return reps
    // pin this level before the census: the per-oversized-cell driver loop
    // below re-scans `reps` once per cell (filter + k-means fit + assign) —
    // uncached, each scan replays the full upstream lineage (the groups
    // shuffle plus any prior refine unions). Caller-owns-block contract
    val pinned = reps.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = pinned.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val over = sizes.filter(_._2 > maxCell).map(_._1)
    if (over.isEmpty) return pinned
    var nextId = sizes.map(_._1).max + 1
    val untouched = pinned.filter(!col("cell").isInCollection(over.toSeq))
    val splits = over.toSeq.map { c =>
      val n = sizes.find(_._1 == c).get._2
      val k = math.min(16, math.max(2, math.ceil(n.toDouble / maxCell).toInt))
      val cellReps = pinned.filter(col("cell") === c).drop("cell")
      val model = new KMeans().setK(k).setSeed(seed + c).setMaxIter(10)
        .fit(cellReps.select(array_to_vector(col("v")).as("features")))
      val centroids = model.clusterCenters.zipWithIndex.map {
        case (cv, i) => (nextId + i, cv.toArray)
      }
      nextId += k
      IVFIndex.assignCells(cellReps, centroids)
        .select("vec_id", "cell", "v")
    }
    refine(splits.foldLeft(untouched)(_ unionAll _), maxCell, seed, depth - 1)
  }
}
