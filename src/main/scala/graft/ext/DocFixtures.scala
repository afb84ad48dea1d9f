package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Tables

/** Deterministic duplicate injection over the (clean) driver corpus so
  * dedup operators have something to find (FIXTURES.md §3 sanctions
  * query-side dirt). Mirrored CTE strings live with each oracle.
  */
object DocFixtures {

  def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** documents ∪ exact copies of every 10th doc (id + 1,000,000). */
  def docsDup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  /** Two injected sub-shingle-width docs (a 2-token and a 1-token text):
    * the input class whose whole-doc pseudo-shingle fallback the shingle
    * consumers (d2/d3 tier builds) must route correctly and t22 must
    * filter before exploding — pinned by DATA since r14, not by comment
    * (the r13 t22 fix predated any fixture exercising it). Ids sit in a
    * 3,000,000 block no other fixture derivation produces and are not
    * ≡0 mod 10, so the dup/near/snippet injections never replicate them.
    */
  def shortDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq((3000001L, "alpha beta"), (3000003L, "alpha"))
      .toDF("doc_id", "text")
  }

  /** documents ∪ near-copies (first word dropped) of every 10th doc,
    * ∪ the two [[shortDocs]].
    */
  def docsNear(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
      .unionAll(shortDocs(s, dir))
  }

  /** documents ∪ the two [[shortDocs]] — the t22 corpus. */
  def docsShort(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select("doc_id", "text").unionAll(shortDocs(s, dir))

  /** Deterministic code-shaped docs derived from every 13th base doc —
    * THREE templates (C-ish, struct-ish, Python-ish) cycled by
    * doc_id div 13, ids in a 2,000,000 block no other fixture
    * derivation produces: the code class the t25 routing gate must
    * fire on, pinned by FIXTURE rows at all three scales since r15
    * (the shortDocs device). Replaces r14's in-query CASE injection,
    * which pinned the detector against only one template. Each
    * template clears both t25 thresholds with wide margin at any id
    * width (symbol density 14–21% of chars vs the 5% gate; keyword
    * density 13–26% of tokens); the base prose corpus clears neither.
    */
  def codeDocsOf(d: DataFrame): DataFrame = {
    val idStr = col("doc_id").cast("string")
    val t0 = concat(lit("def f(x): { return (x * 13) + "), idStr,
      lit("; } import os; struct point { int v = 7; }"))
    val t1 = concat(lit("struct node { int k = "), idStr,
      lit("; void set(int x) { k = (x <= 0) ? 0 : x; } };"))
    val t2 = concat(
      lit("import sys ; def g(y): if (y > 0): return y ; "),
      lit("elif (y < 0): return (0 - y) ; return "), idStr)
    d.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id"),
        when(expr("(doc_id div 13) % 3") === 0, t0)
          .when(expr("(doc_id div 13) % 3") === 1, t1)
          .otherwise(t2).as("text"))
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
  }

  /** documents ∪ byte-noised copies of every 10th doc (ONE character
    * substituted in place at position 5, ids + 4,000,000 — a block no
    * other derivation produces): the media near-dup class m10's
    * positional signature must catch. Substitution (not insertion)
    * keeps every other byte position aligned, so a positional
    * downsample signature moves ≤ 1 bit — whereas docsNear's
    * dropped-word copies shift every byte and are invisible to a
    * positional signature BY DESIGN (like a cropped image to a phash).
    * Docs shorter than 6 chars copy unchanged (an exact dup, hamming 0).
    */
  def docsNoisy(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        when(length(col("text")) >= 6,
          expr("concat(substring(text, 1, 4), 'x', " +
            "substring(text, 6, length(text)))"))
          .otherwise(col("text")).as("text")))
  }

  /** corpus ∪ [[codeDocsOf]] over it — the t25 mixed prose/code shape. */
  def docsCodeOf(d: DataFrame): DataFrame = d.unionAll(codeDocsOf(d))

  /** documents ∪ derived code docs — the t25 corpus. */
  def docsCode(s: SparkSession, dir: String): DataFrame =
    docsCodeOf(docs(s, dir).select("doc_id", "text"))

  /** embeddings ∪ exact vector copies of every 10th id (id + 100,000). */
  def embDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "embeddings").select("vec_id", "embedding")
    e.unionAll(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }
}
