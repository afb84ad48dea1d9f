package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column algebra over `array<float|double>` using Spark's
  * higher-order functions (`zip_with`/`aggregate`) — codegen'd, no UDFs,
  * no driver involvement. Accumulation is an explicit left fold in DOUBLE,
  * which both pins cross-engine determinism (the DuckDB oracle folds the
  * same way) and avoids float32 cancellation.
  *
  * At 100 TB scale these are per-row O(dim) expressions that pipeline
  * inside WholeStageCodegen — the scan stays the bottleneck, as it should.
  */
object VectorOps {

  /** Cast an array<float> to array<double> (no-op cost inside codegen). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Native codegen'd kernel ([[DotProduct]]); same left-to-right
    * accumulation as the equivalent HOF fold
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` it replaced — bit-identical
    * results, ~15× faster on kNN-join shapes.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. Zero-norm inputs yield NULL (`try_divide` — a
    * plain `/` is an ANSI DIVIDE_BY_ZERO job-killer when a zero vector
    * slips in), which fails any `>= tau` threshold — the semantics the
    * dedup/ANN pair rules want: a zero vector is similar to nothing.
    * For nonzero inputs, bit-identical to the plain division.
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Squared L2 distance — native codegen'd kernel ([[L2Sq]]); same
    * left-to-right accumulation as the HOF fold
    * `aggregate(zip_with(a,b,(x,y)=>(x-y)²), 0.0, _+_)` it replaced —
    * bit-identical results (the DotProduct precedent: the PQ encode/ADC
    * path runs 128 of these per row and the interpreted HOF closure
    * dispatch was its entire warm cost).
    */
  def l2sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(L2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
