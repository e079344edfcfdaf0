package graft.plans

import graft.functions.{DotProduct, Hash60}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite the engine-portable *builtin* formulations of
  * the library's hash / vector primitives into their native codegen
  * expressions (SURVEY.md §2.10 tier (c): a `Rule[LogicalPlan]` wired
  * through `SparkSessionExtensions`, for semantics the expression API
  * can't reach — here, users who wrote the portable SQL shapes get the
  * native hot-loop automatically).
  *
  * Two patterns, both value-identical by construction (pinned by
  * PipelineSpec equivalence tests + the DuckDB oracle):
  *  - `conv(substring(md5(c), 1, 15), 16, 10)::long`  → `Hash60(c)`
  *    (graft.functions.PortableHash.hash60Builtin — the shape the oracle
  *    SQL mirrors)
  *  - `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0,
  *    (acc,x) -> acc+x)` → `DotProduct(a, b)`
  *    (graft.pipeline.Similarity.dotHof — the interpreted HOF fold)
  */
object NativeHashRewrite extends Rule[LogicalPlan] {

  private def isLit(e: Expression, v: Any): Boolean = e match {
    case Literal(x, _) => x == v
    case _             => false
  }

  /** `conv(substring(md5(c),1,15),16,10)` (string) — the cast to long on
    * top is matched by the caller.
    */
  private def isHashChain(e: Expression): Option[Expression] = e match {
    case Conv(Substring(Md5(c), p, l), f, t, _)
        if isLit(p, 1) && isLit(l, 15) && isLit(f, 16) && isLit(t, 10) =>
      Some(c)
    case _ => None
  }

  /** double-widening of a lambda variable (already-double vars appear
    * bare; float/other numeric vars appear under a cast to double).
    */
  private def asDoubleOf(e: Expression, v: NamedExpression): Boolean = e match {
    case a: NamedLambdaVariable => a.exprId == v.exprId && a.dataType == DoubleType
    case Cast(a: NamedLambdaVariable, DoubleType, _, _) => a.exprId == v.exprId
    case _ => false
  }

  private def isDotFold(agg: ArrayAggregate): Option[(Expression, Expression)] =
    agg match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(x, y), _)),
            zero,
            LambdaFunction(Add(accRef, elemRef, _), Seq(acc, elem), _),
            finish)
          if isLit(zero, 0.0) &&
            ((asDoubleOf(mx, x) && asDoubleOf(my, y)) || (asDoubleOf(mx, y) && asDoubleOf(my, x))) &&
            refIs(accRef, acc) && refIs(elemRef, elem) && identityFinish(finish) =>
        Some((a, b))
      case _ => None
    }

  private def refIs(e: Expression, v: NamedExpression): Boolean = e match {
    case a: NamedLambdaVariable => a.exprId == v.exprId
    case _                      => false
  }

  private def identityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(v: NamedLambdaVariable), _) =>
      body.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ Cast(inner, LongType, _, _) =>
        isHashChain(inner).map(Hash60(_): Expression).getOrElse(c)
      case agg: ArrayAggregate =>
        isDotFold(agg).map { case (a, b) => DotProduct(a, b): Expression }.getOrElse(agg)
    }
}

/** Session wiring: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.plans.GraftExtensions`)
  * registers the native functions for SQL (`hash60`, `dot_product`) and
  * installs [[NativeHashRewrite]] in the optimizer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      (exprs: Seq[Expression]) => Hash60(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => NativeHashRewrite)
  }
}
