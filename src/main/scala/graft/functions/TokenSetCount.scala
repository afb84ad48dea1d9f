package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a fixed string set — the kernel
  * behind stopword-density scoring and marker-based language-ID, which
  * run on EVERY document of a corpus scan.
  *
  * The composable spelling `size(filter(arr, t => t.isInCollection(set)))`
  * is an interpreted higher-order function: Spark evaluates the lambda
  * per element through closure dispatch and boxes every token, and the
  * expression sits OUTSIDE WholeStageCodegen. This native Catalyst
  * `Expression` generates a direct static call — one hash-set probe per
  * token, no boxing, no closure — inside the consuming operator's codegen
  * loop (same pattern as [[RollingHash]]). Semantics are identical
  * (null elements never match; null array → null), asserted by an
  * equivalence test in `ExtensionsSpec`.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // analysis-time rejection of a non-array<string> argument, instead of a
  // mid-job ClassCastException (the DotProduct pattern)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_count requires array<string> input, got ${other.simpleString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenSetCount.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the set rides the references array as a raw java.util.HashSet —
    // janino-friendly (no generics in generated code)
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenSetCount.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

object TokenSetCount {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, set: java.util.HashSet[_]): Long = {
    var n = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  /** Column API. */
  def token_set_count(arr: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TokenSetCount(org.apache.spark.sql.graft.ColumnBridge.expression(arr),
        words))

  /** SQL form: `token_set_count(arr, array('a', 'b'))` — the set argument
    * must be a foldable array literal (evaluated once at plan time).
    */
  def fromExpressions(arr: Expression, setExpr: Expression): TokenSetCount = {
    require(setExpr.foldable, "token_set_count set argument must be foldable")
    require(setExpr.dataType == ArrayType(StringType) ||
      setExpr.dataType == ArrayType(StringType, containsNull = false),
      s"token_set_count set argument must be ARRAY<STRING>, got ${setExpr.dataType.sql}")
    val data = setExpr.eval().asInstanceOf[ArrayData]
    val elems = data.toObjectArray(StringType)
    require(elems.forall(_ != null),
      "token_set_count set argument must not contain NULL elements")
    TokenSetCount(arr, elems.map(_.asInstanceOf[UTF8String].toString).toSeq)
  }
}
