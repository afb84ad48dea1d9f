package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve value over two bounded integer keys — the
  * multi-column data-layout tool that completes the Sink triad
  * (partitionBy = coarse pruning on ONE key, bucketBy = shuffle-free
  * joins on ONE key, z-order = row-group pruning on SEVERAL keys at
  * once): sorting by the bit-interleaved value places rows close in
  * BOTH dimensions into the same parquet row groups, so min/max
  * statistics prune scans with predicates on either or both columns.
  * This is how lakehouse OPTIMIZE/CLUSTER BY layouts work; at 100 TB
  * layout is the difference between scanning a file and skipping it.
  *
  * The interleave is pure integer Column arithmetic (shifts + masks
  * summed per bit) — codegen'd by Spark, expressible verbatim in the
  * DuckDB oracle, no UDF. Keys must already be in [0, 2^bits); callers
  * clamp/offset their domain (the x4 query shows the idiom).
  */
object ZOrder {

  /** Interleave `a`'s bits into even positions and `b`'s into odd ones:
    * z = Σ_i ((a>>i)&1) << 2i  |  ((b>>i)&1) << (2i+1), as a sum of
    * non-overlapping terms (addition ≡ bitwise OR here).
    */
  def zValue(a: Column, b: Column, bits: Int = 10): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .cast("long")
    }.reduce(_ + _)

  /** The same expression as DuckDB SQL over column names — single
    * definition rendered for the oracle so the formula cannot drift.
    */
  def zValueSql(a: String, b: String, bits: Int = 10): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
