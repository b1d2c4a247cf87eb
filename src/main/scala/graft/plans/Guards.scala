package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

/** Session-level guardrail, injected with `injectCheckRule` via
  * [[graft.functions.GraftExtensions]]: refuse any inner join with NO
  * effective join condition whose two sides are BOTH estimated above
  * the broadcast threshold. A small-side cross join plans as a
  * broadcast nested loop — bounded shuffle, legitimate (probe sets,
  * bin tables); a big-big unconditioned join is an all-pairs cartesian
  * product with no scale story, and at 100 TB it should fail analysis
  * in seconds, not melt a cluster for hours. The same invariant is
  * linted over the whole catalog in RelationalSpec; the check rule
  * enforces it for ad-hoc SQL-surface users of a session built with
  * the extension.
  *
  * Check rules run on the ANALYZED plan, before predicate pushdown —
  * so `FROM a, b WHERE a.k = b.k` (and `crossJoin(...).filter(...)`)
  * still look like a bare Join under a Filter here. A join is
  * therefore treated as conditioned if ANY filter in the plan
  * references both of its sides; the predicate will be pushed into
  * the join by the optimizer (the same reason Spark's own
  * CheckCartesianProducts runs post-pushdown). Conservative in the
  * permissive direction: a guardrail must never reject a valid query.
  *
  * Stats come from the logical plan (file sizes, or CBO stats after
  * ANALYZE TABLE), so the guard sees through projections and filters
  * the same way the planner does.
  */
case class CartesianGuard(spark: SparkSession)
    extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit = {
    lazy val filterConds = plan.collect { case f: Filter => f.condition }
    plan.foreach {
      case Join(l, r, _: InnerLike, None, _) =>
        val conf = spark.sessionState.conf.autoBroadcastJoinThreshold
        val thr = if (conf > 0) BigInt(conf) else BigInt(10L * 1024 * 1024)
        val big = l.stats.sizeInBytes > thr && r.stats.sizeInBytes > thr
        lazy val conditionedAbove = filterConds.exists { c =>
          c.references.intersect(l.outputSet).nonEmpty &&
            c.references.intersect(r.outputSet).nonEmpty
        }
        if (big && !conditionedAbove)
          throw new IllegalStateException(
            "graft guard: unconditioned inner join between two relations " +
              s"each estimated above the broadcast threshold ($thr bytes) " +
              "— an all-pairs cartesian product. Add a join condition or " +
              "broadcast() a side small enough to replicate.")
      case _ => ()
    }
  }
}
