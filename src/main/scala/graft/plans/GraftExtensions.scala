package graft.plans

import graft.functions.CompactionWeightExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThan, GreaterThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Derived-bound pushdown for compaction-weight filters (SURVEY.md §4,
  * custom rule #2).
  *
  * `weight > c` with `c >= 0` implies `size_mb >= 10` (the formula pins
  * weight to 0 below 10 MB — reference
  * `api/compactor/CompactionWeight.java:40-41`). The weight itself is a
  * nonlinear expression of (size, files, locality) that no generic
  * optimizer can push through; this rule injects the implied linear bound
  * as an extra conjunct, which Catalyst's own PushDownPredicates then
  * drives into the scan (visible as parquet PushedFilters when the
  * metrics come from storage rather than a derived aggregate).
  */
object PushCompactionWeightBounds extends Rule[LogicalPlan] {

  private def derive(cond: Expression): Seq[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val derived = conjuncts.collect {
      case GreaterThan(CompactionWeightExpr(size, _, _, _), Literal(c: Double, _)) if c >= 0.0 =>
        GreaterThanOrEqual(size, Literal(10L, LongType))
    }.filterNot(d => conjuncts.exists(_.semanticEquals(d)))
    // several thresholds over one weight derive the same bound — add it once
    derived.foldLeft(Seq.empty[Expression]) { (acc, d) =>
      if (acc.exists(_.semanticEquals(d))) acc else acc :+ d
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val extra = derive(cond)
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)(And(_, _)), child)
  }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** Wrong-arity SQL calls get a real error message instead of an
    * IndexOutOfBoundsException escaping the function builder. */
  private def arity(name: String, n: Int)(
      build: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      if (exprs.length != n)
        throw new IllegalArgumentException(
          s"$name requires $n argument(s), got " + exprs.length)
      build(exprs)
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushCompactionWeightBounds)
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("salted_key"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions.SaltedKey", "salted_key"),
      arity("salted_key", 1)(exprs => graft.functions.SaltedKey(exprs.head))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions.VectorDot", "vec_dot"),
      arity("vec_dot", 2)(exprs => graft.functions.VectorDot(exprs(0), exprs(1)))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("vec_sumsq"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions.VectorSumSq", "vec_sumsq"),
      arity("vec_sumsq", 1)(exprs => graft.functions.VectorSumSq(exprs.head))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("plane_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions.PlaneDot", "plane_dot"),
      arity("plane_dot", 2)(exprs => graft.functions.PlaneDot(exprs(0), exprs(1)))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("nfc"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions.NormalizeNfc", "nfc"),
      arity("nfc", 1)(exprs => graft.functions.NormalizeNfc(exprs.head))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("compaction_weight"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions.CompactionWeightExpr", "compaction_weight"),
      arity("compaction_weight", 4)(exprs =>
        graft.functions.CompactionWeightExpr(exprs(0), exprs(1), exprs(2), exprs(3)))))
  }
}
