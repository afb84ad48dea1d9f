package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salt the fact side deterministically
  * and replicate the dim side across the salt space, so one hot key fans
  * out over `nSalts` reducers instead of melting a single one.
  *
  * Complements AQE's runtime skew-join splitting (on by default) for the
  * cases AQE can't fix — e.g. a broadcast-ineligible dim joined on a key
  * where one value dominates (a "null customer" or "unknown product" at
  * 100 TB). Salt is derived from a caller-chosen per-row column (NOT
  * `rand()` — deterministic replay matters for retries and the oracle).
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, fanning each fact row to one of
    * `nSalts` sub-keys and replicating every dim row to all of them.
    * Result is row-identical to the unsalted join.
    *
    * @param saltSource any fact column with per-row variation (unique id,
    *                   line number, offset…) — hashed to pick the salt
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(xxhash64(saltSource), lit(nSalts)))
    val replicated = dim.crossJoin(
      spark(dim).range(nSalts).select(col("id").cast("long").as("_salt")))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  private def spark(df: DataFrame) = df.sparkSession
}
