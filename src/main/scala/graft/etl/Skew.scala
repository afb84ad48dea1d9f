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
    // replicate via a narrow explode, not a crossJoin with a salt range:
    // same rows, but no join operator at all — the replication stays in
    // the dim's own stage (and the plan keeps the repo-wide
    // equi-joins-only invariant, PlanSpec). The dim is repartitioned
    // with an explicit count first (the a48 pre-fan-out rule,
    // PartitionOps): a single-file dim scan would otherwise write the
    // ×nSalts replicated shuffle rows from ONE core.
    val replicated = graft.PartitionOps
      .repartitionBeforeFanout(dim, col(key))
      .withColumn("_salt",
        explode(sequence(lit(0L), lit(nSalts - 1L))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
