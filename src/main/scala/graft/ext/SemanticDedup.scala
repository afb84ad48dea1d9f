package graft.ext

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
  * cell dedups independently (embarrassingly parallel). A pathological
  * jumbo cell bounds the worst case — production adds a per-cell pair cap
  * with recursive re-split (train a sub-quantizer inside any cell over the
  * cap), the d2 df-cap idea applied to cluster occupancy.
  */
object SemanticDedup {

  /** Every vector with its cell and duplicate flag:
    * (vec_id, cell, is_dup). The building block the tests replay
    * brute-force; [[dedup]] is the kept-corpus view.
    */
  def flagged(emb: DataFrame, nLists: Int, tau: Double,
      seed: Long = 42L): DataFrame = {
    val idx = IVFIndex.build(emb, nLists, seed)
    val l = idx.assigned.select(col("vec_id"), col("cell"), col("v"))
    val dups = l.as("x").join(l.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") > col("y.vec_id"))
      .filter(VectorOps.cosine(col("x.v"), col("y.v")) >= tau)
      .select(col("x.vec_id").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    // build cache lifecycle: the assignment is read twice (join sides) —
    // the caller (bench isolation / a real deploy's cell-partitioned
    // write) owns dropping the block, same contract as s4's index
    l.select("vec_id", "cell").join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** The deduplicated corpus: ids that survive semantic dedup. */
  def dedup(emb: DataFrame, nLists: Int, tau: Double,
      seed: Long = 42L): DataFrame =
    flagged(emb, nLists, tau, seed)
      .filter(!col("is_dup"))
      .select("vec_id")
}
