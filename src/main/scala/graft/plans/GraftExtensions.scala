package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point — the idiomatic cluster-wide switch:
  *
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Injects the interval-join rewrite into every session's optimizer (a
  * naively written `keyEq AND s.Start < o.End AND o.Start < s.End` join
  * plans as the binned range join instead of a per-key nested loop) and
  * registers the graft scalar kernels as SQL functions, so pure-SQL
  * surfaces (spark-sql shell, Thrift server, notebooks) get them with
  * zero Scala imports. Per-session opt-in alternative:
  * `spark.experimental.extraOptimizations ++= Seq(IntervalJoinRewrite)`
  * plus `graft.expr.Exprs.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import graft.expr.{NatSortKey, TranslateCds}

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => IntervalJoinRewrite)
    ext.injectPlannerStrategy(_ => IntervalSweepStrategy)
    ext.injectFunction((
      new FunctionIdentifier("natsort_key"),
      new ExpressionInfo(classOf[NatSortKey].getName, "natsort_key"),
      (exprs: Seq[Expression]) => NatSortKey(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("translate_cds"),
      new ExpressionInfo(classOf[TranslateCds].getName, "translate_cds"),
      (exprs: Seq[Expression]) => TranslateCds(exprs.head)))
  }
}
