package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.LongArrayDot

/** Optimizer rule: rewrite the portable higher-order dot-product pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v) }}}
  *
  * into the native codegen'd [[LongArrayDot]], so portable SQL (the form
  * [[graft.functions.TextFunctions.dotS]] emits, and what a user migrating
  * DuckDB/Trino list arithmetic writes) gets the tight primitive loop
  * (~70us interpreted HOF vs ~ns/element native, measured at bench scale)
  * without knowing the native function exists.
  *
  * Soundness: applies only when both inputs are `ARRAY<BIGINT>` with
  * non-nullable elements. For those inputs the HOF's full semantics are
  *   - unequal lengths: `zip_with` pads the shorter side with nulls, the
  *     null poisons the sum -> result is NULL;
  *   - either array NULL -> NULL;
  *   - equal lengths -> the exact integer dot product,
  * which is precisely `if(size(a) = size(b), long_dot(a, b), NULL)` — the
  * rewrite target contains no ArrayAggregate, so the rule converges in one
  * operator-optimization pass (no self-triggering fixed-point growth).
  * Further guards:
  *   - both inputs must be deterministic — the rewrite references each one
  *     twice (size guard + dot), which would double-evaluate a
  *     non-deterministic input;
  *   - the arithmetic must be ANSI-mode (the Spark 4 default): ANSI
  *     Multiply/Add raise on 64-bit overflow and [[LongArrayDot]] uses
  *     `multiplyExact`/`addExact`, so both sides fail loudly rather than
  *     wrap. LEGACY (wrapping) and TRY (null-on-overflow) HOFs are left
  *     alone — their overflow results differ from the checked native loop.
  *
  * One documented deviation remains: for MISMATCHED-length inputs whose
  * overlapping prefix would overflow, the ANSI HOF raises (zip_with
  * computes the overlap products eagerly) while the rewrite short-circuits
  * on the size guard and returns the NULL the HOF would have produced had
  * the products fit. The rewrite never fabricates a value — it can only
  * turn that corner-case error into the semantically-motivated NULL.
  */
object RewriteLongDot extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  private def isZeroLong(e: Expression): Boolean =
    e.foldable && e.dataType == LongType && {
      val v = e.eval()
      v != null && v.asInstanceOf[Long] == 0L
    }

  /** `f` combines exactly the two bound lambda vars, in either order. */
  private def combinesVars(
      a: Expression, b: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean = (a, b) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
      (x.exprId == v1.exprId && y.exprId == v2.exprId) ||
        (x.exprId == v2.exprId && y.exprId == v1.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // the arithmetic nodes bind whole (their third ctor param is a version-
    // dependent eval context); the ANSI requirement checks the evalMode
    // accessor in the guard
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(mul: Multiply,
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(add: Add,
            Seq(macc: NamedLambdaVariable, mel: NamedLambdaVariable), _),
          LambdaFunction(fv: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        if isLongArray(l) && isLongArray(r) && l.deterministic && r.deterministic &&
          mul.evalMode == EvalMode.ANSI && add.evalMode == EvalMode.ANSI &&
          isZeroLong(zero) &&
          combinesVars(mul.left, mul.right, zx, zy) &&
          combinesVars(add.left, add.right, macc, mel) &&
          fv.exprId == fa.exprId =>
      If(EqualTo(Size(l), Size(r)), LongArrayDot(l, r), Literal(null, LongType))
  }
}
