package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** `spark.sql.extensions` entry point: registers the engine's native
  * Catalyst expressions at session build, so a deployment enables the whole
  * function surface declaratively —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * or in code: `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Unlike [[graft.functions.VectorExpressions.register]] (per-session
  * imperative form the query registry uses), extension-injected functions
  * survive `newSession()` and need no library call before first use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (es: Seq[Expression]) => {
          require(es.length == arity,
            s"$name expects $arity argument(s), got ${es.length}")
          builder(es)
        }))
    }
    // portable HOF dot products run through the native codegen'd loop
    ext.injectOptimizerRule(_ => graft.plans.RewriteLongDot)
    // the native AS-OF join operator (custom LogicalPlan -> physical merge)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}

object GraftExtensions {
  /** (name, arity, builder) for every native expression the engine ships. */
  val functions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("long_dot", 2, es => LongArrayDot(es(0), es(1))),
    ("long_l2", 2, es => LongArrayL2(es(0), es(1))),
    ("simhash32", 1, es => LongArraySimHash(es(0))),
    ("shingle3_hash", 1, es => Shingle3Hash(es(0))),
    ("minhash16", 1, es => MinHash16(es(0))),
    ("max_elem_count", 1, es => LongArrayMaxCount(es(0))),
    ("hyperplane_key", 2, es => HyperplaneKey(es(0), es(1))),
    ("hyperplane_key6", 1,
      es => HyperplaneKey(es(0), org.apache.spark.sql.catalyst.expressions.Literal(6))),
    ("zorder2", 2, es => ZOrder2(es(0), es(1))),
    ("audio_fp56", 1, es => AudioFp56(es(0)))
  )
}
