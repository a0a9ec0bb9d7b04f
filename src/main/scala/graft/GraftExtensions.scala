package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr._

/** Production wiring for the custom expressions: register via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * so every session (including SQL-only users) gets `truncate_utf8`,
  * `mask_to_names`, `sqlserver_uuid_sort_key`, `row_uuid`, `float_dot`, and
  * `minhash_signature` as first-class functions. Programmatic sessions
  * can also call [[graft.expr.GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def entry(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.expr", name),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(entry("truncate_utf8",
      args => TruncateUtf8(args(0), args(1))))
    ext.injectFunction(entry("mask_to_names",
      args => MaskToNames(args(0), args(1))))
    ext.injectFunction(entry("sqlserver_uuid_sort_key",
      args => SqlServerUuidSortKey(args(0))))
    ext.injectFunction(entry("row_uuid",
      args => RowUuid(args(0), args(1))))
    ext.injectFunction(entry("float_dot",
      args => FloatDotProduct(args(0), args(1))))
    ext.injectFunction(entry("minhash_signature",
      args => MinhashSignature(args(0), GraftFunctions.MinhashK,
        GraftFunctions.ShingleLen, GraftFunctions.ShingleStride,
        GraftFunctions.MinhashP)))
    ext.injectFunction(entry("hyperplane_bucket",
      args => HyperplaneBucket(args(0))))
    ext.injectFunction(entry("normalize_text",
      args => NormalizeText(args(0))))
    // Optimizer rung of the ladder: naive `k >= lo AND k < hi` theta joins
    // (BroadcastNestedLoop, O(n·m)) rewrite to the bucketed equi-join —
    // see graft.plans.RangeJoinRewrite.
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
