package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the canonical higher-order-function distance
  * patterns into the native vector kernels, so SQL/DataFrame users who
  * write the textbook form get the allocation-free codegen loop
  * automatically:
  *
  *   aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0D, (s,v) -> s+v)
  *     ==> vec_sqdist(a, b)            ([[SquaredDistance]])
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0.0D, (s,v) -> s+v)
  *     ==> vec_dot(a, b)               ([[DotProduct]])
  *
  * Exact on ANY input, not just the engine's vector columns: the kernels
  * fold left-to-right like the HOF they replace (bit-identical sums) and
  * reproduce the HOF's NULL semantics — ragged pairs and NULL elements
  * both yield NULL ([[VectorFoldExpression]] guards at runtime; the
  * per-element null test is compiled out when the schema proves
  * `containsNull = false`). So the rewrite is semantics-preserving even
  * for user queries over nullable arrays (ADVICE r2).
  *
  * Injected via `graft.functions.GraftExtensions`
  * (`spark.sql.extensions`) or ad hoc through
  * `spark.experimental.extraOptimizations`.
  */
object NativeKernelRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(body, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero, merge, finish)
      if isZeroD(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
        isVec(a) && isVec(b) =>
      body match {
        case Multiply(Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
            Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _)
          if x1.exprId == x.exprId && x2.exprId == x.exprId &&
             y1.exprId == y.exprId && y2.exprId == y.exprId =>
          SquaredDistance(a, b)
        case Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _)
          if x1.exprId == x.exprId && y1.exprId == y.exprId =>
          DotProduct(a, b)
        case _ =>
          ArrayAggregate(ZipWith(a, b,
            LambdaFunction(body, Seq(x, y))), zero, merge, finish)
      }
  }

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  private def isSumMerge(e: Expression): Boolean = e match {
    case LambdaFunction(Add(s1: NamedLambdaVariable, v1: NamedLambdaVariable, _),
        Seq(s: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      s1.exprId == s.exprId && v1.exprId == v.exprId
    case _ => false
  }

  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }
}
