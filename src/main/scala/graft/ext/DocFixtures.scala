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

  /** embeddings ∪ exact vector copies of every 10th id (id + 100,000). */
  def embDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(s, dir, "embeddings").select("vec_id", "embedding")
    e.unionAll(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }
}
