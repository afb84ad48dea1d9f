package graft.etl

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared cleaned-table pipelines, cached per (session, dir).
  *
  * The reference materializes the cleaned sales frame once and feeds three
  * derived tables from it (`main.py:71-75`); SURVEY §3 keeps exactly this
  * one eager materialization. A dozen driver queries consume the cleaned
  * fact — caching it turns N dedup-shuffle recomputations into one.
  * (Spark's `.cache()` is lazy: the first action materializes, later
  * queries reuse the in-memory columnar form.)
  */
object Pipelines {

  private val cache = TrieMap.empty[(SparkSession, String), DataFrame]

  def cleanSales(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((s, s"sales:$dir"),
      TransformSales.clean(Tables.dirtySales(s, dir)).cache())

  def cleanCustomers(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((s, s"customers:$dir"),
      TransformCustomers.clean(Tables.dirtyCustomers(s, dir)).cache())
}
