package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized Count-Min sketch for a key's estimated count —
  * the read side of `Dataset.stat.countMinSketch` (which Spark ships with
  * no query expression; cf. `BloomFilterMightContain`, the equivalent it
  * DOES ship for blooms, whose constant-sketch design this mirrors).
  *
  * `left` must be a FOLDABLE binary (the driver-built sketch folded into
  * the plan as a constant, j5's bloom pattern — a few KB of sketch move,
  * never the data); `right` is the long key to estimate. The sketch is
  * deserialized ONCE per executor expression instance (`@transient lazy`)
  * and generated code probes it via a direct reference call inside the
  * consuming operator's WholeStageCodegen loop — per row it is d array
  * reads, no boxing beyond the sketch API's `Object` signature.
  *
  * CMS guarantee (Cormode–Muthukrishnan): estimate ≥ exact always, and
  * estimate ≤ exact + ε·N with probability ≥ confidence — pinned
  * quantitatively for a14 in AnalyticsSpec at two scales.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("sketch side must be BINARY")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "sketch side must be a constant (build it on the driver)")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("key side must be BIGINT")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
      left.eval(null).asInstanceOf[Array[Byte]]))

  /** Shared by interpreted eval and generated code. */
  def estimate(key: Long): Long = sketch.estimateCount(Long.box(key))

  override protected def nullSafeEval(sketchBytes: Any, key: Any): Any =
    estimate(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the sketch child is a constant — reference THIS expression instance
    // (with its cached deserialized sketch) instead of re-evaluating the
    // byte-array child per row
    val ref = ctx.addReferenceObj("cmsEstimate", this,
      classOf[CmsEstimate].getName)
    defineCodeGen(ctx, ev, (_, key) => s"$ref.estimate($key)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsEstimate = copy(left = newLeft, right = newRight)
}

object CmsEstimate {

  /** Column API: `cms_estimate(lit(sketchBytes), keyCol)`. */
  def cms_estimate(sketch: Column, key: Column): Column = {
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    bridge.column(CmsEstimate(bridge.expression(sketch),
      bridge.expression(key)))
  }
}
