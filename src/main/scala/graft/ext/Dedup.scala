package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines over the
  * `documents` table — the core of any 100 TB corpus build.
  *
  * Scale design:
  *  - exact dedup shuffles only (doc_id, 128-bit content hash) — the text
  *    never crosses the wire;
  *  - near-dup candidate generation goes through an inverted shingle index
  *    (explode→join), never an O(n²) cross join; the MinHash-LSH variant
  *    ([[MinHashLSH]]) replaces the full index with banded signatures when
  *    even the shingle join is too large.
  */
object Dedup {

  /** Exact dedup: keep the smallest doc_id per md5(normalized text).
    * Projecting to (doc_id, hash) *before* the shuffle means the window
    * moves 24 bytes/row, not documents.
    */
  def exact(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val w = Window.partitionBy("h").orderBy("doc_id")
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id")
  }

  /** Word n-gram shingles over a TOKEN-ARRAY column; documents shorter than
    * n tokens contribute their whole token sequence as one shingle (both
    * engines guard this — Spark `sequence(1, k)` with k<1 would descend
    * while DuckDB `range(k)` would be empty).
    *
    * Takes the tokens as a bound column, not the tokenizer expression:
    * higher-order functions run interpreted (no whole-stage codegen), so an
    * expression argument would be RE-EVALUATED on every lambda access —
    * measured 75× slower when `split()` was inlined here. Callers must
    * project the token array first (CollapseProject keeps the split
    * un-inlined because it is non-cheap and multiply referenced).
    */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array(array_join(tokens, " ")))

  /** Distinct (doc_id, shingle) pairs — the inverted-index edge list.
    * Set semantics are per-document, so `array_distinct` BEFORE the explode
    * does the dedup as a narrow operation — no shuffle; the global
    * `.distinct()` a naive explode would need costs a full shuffle of the
    * shingle strings.
    */
  def shingleIndex(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("toks"), n))).as("sh"))

  /** Shared candidate-pair pipeline: (id1 < id2, inter, n1, n2) for every
    * document pair sharing ≥1 indexed shingle — the building block both
    * Jaccard ([[ngramJaccardPairs]]) and containment
    * ([[containmentPairs]]) score, each with its own denominator.
    */
  private def scoredCandidates(docs: DataFrame, n: Int,
      dfMax: Option[Int]): DataFrame = {
    // Materialize the index once: it feeds the df-cap filter, the per-doc
    // sizes and BOTH self-join sides — without this the (interpreted,
    // HOF-based) shingle derivation re-runs per reference. The in-job
    // analog of persisting the inverted index as a table, which is what a
    // 100 TB corpus build does anyway (build once, reuse across rounds).
    val idx0 = shingleIndex(docs, n).localCheckpoint()
    val idx = dfMax.fold(idx0) { m =>
      val keep = idx0.groupBy("sh").count().filter(col("count") <= m).select("sh")
      idx0.join(keep, "sh").localCheckpoint()
    }
    val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = idx.as("a")
    val b = idx.as("b")
    a.join(b, col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
  }

  /** Exact n-gram Jaccard near-dup pairs via the inverted shingle index:
    * intersection counts from a self-join on shared shingles, union from
    * per-doc set sizes. Only candidate pairs that share ≥1 shingle are
    * scored — with n≥5 word grams, unrelated documents essentially never
    * collide, so the join output stays near-linear. At larger scale, cap
    * shingle document-frequency (drop shingles appearing in >df_max docs)
    * before the self-join; with the default corpus this is a no-op.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      dfMax: Option[Int] = None): DataFrame =
    scoredCandidates(docs, n, dfMax)
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Asymmetric shingle CONTAINMENT — |A∩B| / |A| ≥ τ flags documents
    * CONTAINED in another (quotes, leading snippets, partial extractions):
    * the case symmetric Jaccard structurally misses, because a short
    * snippet of a long document has near-zero Jaccard however perfect the
    * inclusion (|A∩B|/|A∪B| ≈ |A|/|B|). Directed output
    * (inner_id, outer_id, containment): both directions of each candidate
    * pair are emitted from the ONE undirected pair join by exploding a
    * two-element struct array — a union of two projections would make
    * Catalyst recompute the whole pair-join subtree per branch (the index
    * is checkpoint-shared, but the join/aggregate shuffles are not),
    * while the explode reads each scored pair once — so the plan cost is
    * exactly [[ngramJaccardPairs]]'s (the d2 curve family, same
    * df-capped index) plus a 2× narrow Generate.
    */
  def containmentPairs(docs: DataFrame, n: Int, threshold: Double,
      dfMax: Option[Int] = None): DataFrame =
    scoredCandidates(docs, n, dfMax)
      .select(explode(array(
        struct(col("id1").as("inner_id"), col("id2").as("outer_id"),
          (col("inter").cast("double") / col("n1")).as("containment")),
        struct(col("id2").as("inner_id"), col("id1").as("outer_id"),
          (col("inter").cast("double") / col("n2")).as("containment"))))
        .as("e"))
      .select(col("e.inner_id"), col("e.outer_id"), col("e.containment"))
      .filter(col("containment") >= threshold)
}
