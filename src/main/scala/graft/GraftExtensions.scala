package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CmsEstimate, DotProduct, RollingHash, TokenSetCount, WinnowFingerprints}

/** Standard extension installer: makes graft's native Catalyst expressions
  * SQL-callable in any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)` on the builder) — the same
  * integration point Spark-extension libraries use, so `spark.sql(...)`
  * users get the functions without touching the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)),
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => WinnowFingerprints(children.head,
        children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int])),
    (new FunctionIdentifier("token_set_count"),
      new ExpressionInfo(classOf[TokenSetCount].getName, "token_set_count"),
      (children: Seq[Expression]) =>
        TokenSetCount.fromExpressions(children(0), children(1))),
    (new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children(0), children(1))))

  /** Register on an already-running session (the extensions config only
    * applies at session build time): SQL-callable functions plus the
    * optimizer rules via experimental.extraOptimizations (idempotent —
    * harness mains and the shared test session all call this).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val rules = spark.experimental.extraOptimizations
    if (!rules.contains(graft.plans.BandedLevenshteinRule))
      spark.experimental.extraOptimizations =
        rules :+ graft.plans.BandedLevenshteinRule
  }
}
