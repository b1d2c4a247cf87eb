package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Session-level guardrail, injected with `injectCheckRule` via
  * [[graft.functions.GraftExtensions]]: refuse any inner join with NO
  * join condition whose two sides are BOTH estimated above the
  * broadcast threshold. A small-side cross join plans as a broadcast
  * nested loop — bounded shuffle, legitimate (probe sets, bin tables);
  * a big-big unconditioned join is an all-pairs cartesian product with
  * no scale story, and at 100 TB it should fail analysis in seconds,
  * not melt a cluster for hours. The same invariant is linted over the
  * whole catalog in RelationalSpec; the check rule enforces it for
  * ad-hoc SQL-surface users of a session built with the extension.
  *
  * Stats come from the logical plan (file sizes, or CBO stats after
  * ANALYZE TABLE — q added in ScaleSpec), so the guard sees through
  * projections and filters the same way the planner does.
  */
case class CartesianGuard(spark: SparkSession)
    extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit = plan.foreach {
    case Join(l, r, _: InnerLike, None, _) =>
      val conf = spark.sessionState.conf.autoBroadcastJoinThreshold
      val thr = if (conf > 0) BigInt(conf) else BigInt(10L * 1024 * 1024)
      if (l.stats.sizeInBytes > thr && r.stats.sizeInBytes > thr)
        throw new IllegalStateException(
          "graft guard: unconditioned inner join between two relations " +
            s"each estimated above the broadcast threshold ($thr bytes) " +
            "— an all-pairs cartesian product. Add a join condition or " +
            "broadcast() a side small enough to replicate.")
    case _ => ()
  }
}
