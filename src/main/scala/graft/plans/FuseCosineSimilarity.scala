package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the composed higher-order-function cosine —
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (s, v) => s + v)
  *     / (sqrt(aggregate(a, 0.0, (s, x) => s + x * x))
  *        * sqrt(aggregate(b, 0.0, (s, x) => s + x * x))) }}}
  *
  * — into the fused native [[CosineSimilarity]] expression: one pass,
  * zero intermediate array allocation, whole-stage codegen. Users (and
  * SQL generators) can write the declarative HOF form and still get the
  * hand-fused kernel — the textbook use of a `Rule[LogicalPlan]`:
  * pattern-level rewrites the DataFrame API cannot express.
  *
  * Semantics note: identical for well-formed inputs (equal-length,
  * non-empty, non-null, non-zero vectors — the sequential left-fold
  * accumulation order is preserved bit-for-bit). On degenerate inputs
  * the native form returns NULL where the HOF form would raise a
  * divide-by-zero under ANSI mode — strictly more defined, never less.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`;
  * tests attach it with `spark.experimental.extraOptimizations`.
  */
object FuseCosineSimilarity extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case _ => e
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(v, DoubleType) => v == 0.0
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) =>
      body.semanticEquals(v)
    case _ => false
  }

  /** `(s, v) => s + v` over the given lambda args. */
  private def isPlainSum(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(l, r, _), Seq(s: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (stripCast(l).semanticEquals(s) && stripCast(r).semanticEquals(v)) ||
        (stripCast(l).semanticEquals(v) && stripCast(r).semanticEquals(s))
    case _ => false
  }

  /** Recognize `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, sum)`. */
  private def asDot(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero, merge, finish)
        if isZero(zero) && isPlainSum(merge) && isIdentity(finish) &&
          ((stripCast(ml).semanticEquals(x) && stripCast(mr).semanticEquals(y)) ||
            (stripCast(ml).semanticEquals(y) && stripCast(mr).semanticEquals(x))) =>
      Some((a, b))
    case _ => None
  }

  /** Recognize `aggregate(a, 0.0, (s, x) => s + x*x)` (a squared-norm
    * accumulation) and return `a`. */
  private def asNormAgg(e: Expression): Option[Expression] = e match {
    case ArrayAggregate(a, zero,
        LambdaFunction(Add(al, ar, _),
          Seq(s: NamedLambdaVariable, x: NamedLambdaVariable), _),
        finish) if isZero(zero) && isIdentity(finish) =>
      val (accSide, sqSide) =
        if (stripCast(al).semanticEquals(s)) (al, ar) else (ar, al)
      // stripCast BEFORE matching the square: for non-double elements
      // (array<float> — the common embedding type) the analyzer wraps
      // x*x as Cast(Multiply(x,x), double), and matching the raw node
      // would silently never fuse exactly the inputs the kernel is for
      stripCast(sqSide) match {
        case Multiply(l, r, _)
            if stripCast(accSide).semanticEquals(s) &&
              stripCast(l).semanticEquals(x) && stripCast(r).semanticEquals(x) =>
          Some(a)
        case _ => None
      }
    case _ => None
  }

  /** The element types [[CosineSimilarity]]'s getters accept — the
    * rewrite must not fire for anything else (an HOF cosine over
    * array<string> works via implicit casts; substituting the kernel
    * would turn it into a runtime IllegalArgumentException, since
    * checkInputDataTypes never re-runs post-analysis). */
  private def fusableElement(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(t, _) => t match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(dotE, Multiply(Sqrt(n1), Sqrt(n2), _), _) =>
        (asDot(dotE), asNormAgg(n1), asNormAgg(n2)) match {
          case (Some((a, b)), Some(na), Some(nb))
              if a.semanticEquals(na) && b.semanticEquals(nb) &&
                fusableElement(a) && fusableElement(b) =>
            CosineSimilarity(a, b)
          case _ => d
        }
    }
}
