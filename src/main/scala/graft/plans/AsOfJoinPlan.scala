package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of join — the "whole-operator" extension tier (custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`), used where composing
  * built-ins is possible but pays real overhead: the union+window
  * formulation in `operators.AsOf` routes BOTH tables through one
  * shuffle+sort as a single stream (right rows become carry-forward
  * markers inside the left's window), while this operator shuffles and
  * sorts each side independently on its own key/ts and then streams a
  * single ordered merge pass per partition — the sort-merge-join shape,
  * with right-side state of exactly one (key, ts) pair.
  *
  * Semantics (matches `AsOf.asofJoin` and DuckDB `ASOF JOIN ... ON
  * l.key = r.key AND l.ts >= r.ts`): every left row gains the greatest
  * right ts <= its own ts for the same key, null when none. Ties take
  * the right row.
  *
  * Scope: key must be BIGINT and both ts TIMESTAMP (primitive-long
  * comparisons in the merge loop; generic orderable types would swap in
  * `RowOrdering`). Right rows with null key/ts are skipped; null left
  * keys never match. This is the dominant shape for event streams
  * (entity id + event time).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    asofAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofAttr
  // asof_ts is minted by this node, not read from a child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinNode into AsOfJoinExec; injected via
  * `spark.experimental.extraStrategies` (see NativeAsOf) or
  * `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, out) =>
      AsOfJoinExec(lk, lts, rk, rts, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    asofAttr: AttributeReference,
    left: SparkPlan, right: SparkPlan) extends SparkPlan
    with BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Both children hash-clustered on their key: EnsureRequirements
    * inserts co-partitioned exchanges (or none, if the child already
    * satisfies the distribution — e.g. bucketed layouts). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Each side sorted by (key, ts) within its partitions — the merge
    * below is then one streaming pass, O(1) state. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  /** The merge preserves the left child's (key, ts) order. */
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val outAttrs = output
    val leftAttrs = left.output
    val asof = asofAttr
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outAttrs, leftAttrs :+ asof)
      val tsRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      // the single piece of right-side state: the last consumed
      // right (key, ts) — rows themselves are never retained, so the
      // underlying iterators may reuse row objects freely
      var haveLast = false
      var lastKey = 0L
      var lastTs = 0L
      var rKey = 0L
      var rTs = 0L
      var rValid = false
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          val r = rIter.next()
          val k = rkB.eval(r)
          val t = rtB.eval(r)
          if (k != null && t != null) {
            rKey = k.asInstanceOf[Long]
            rTs = t.asInstanceOf[Long]
            rValid = true
          } // null key/ts right rows can never be an as-of match: skip
        }
      }
      advanceRight()
      lIter.map { l =>
        val lkAny = lkB.eval(l)
        val ltAny = ltB.eval(l)
        if (lkAny == null || ltAny == null) {
          tsRow.setNullAt(0)
        } else {
          val lk = lkAny.asInstanceOf[Long]
          val lt = ltAny.asInstanceOf[Long]
          while (rValid && (rKey < lk || (rKey == lk && rTs <= lt))) {
            lastKey = rKey
            lastTs = rTs
            haveLast = true
            advanceRight()
          }
          if (haveLast && lastKey == lk) tsRow.update(0, lastTs)
          else tsRow.setNullAt(0)
        }
        project(joined(l, tsRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public builder + catalog query for the native operator. */
object NativeAsOf {
  import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
  import org.apache.spark.sql.functions._

  /** Register the strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val ex = spark.experimental
    if (!ex.extraStrategies.contains(AsOfJoinStrategy)) {
      ex.extraStrategies = ex.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** As-of join through the native operator. Same contract as
    * `AsOf.asofJoin` (bigint key, timestamp ts). The right side is
    * re-aliased through a projection so a self-join gets fresh
    * attribute ids. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightTs: String = "asof_ts"): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    require(!left.columns.contains(rightTs),
      s"asofJoin: left already has a column named '$rightTs'")
    val rightP = right.select(col(key).as("__asof_rk"),
      col(ts).as("__asof_rts"))
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightP.queryExecution.analyzed
    val lk = lPlan.output.find(_.name == key).getOrElse(
      sys.error(s"no column '$key' on left"))
    val lts = lPlan.output.find(_.name == ts).getOrElse(
      sys.error(s"no column '$ts' on left"))
    val Seq(rk, rts) = rPlan.output
    require(lk.dataType == LongType && rk.dataType == LongType,
      s"asofJoin key must be BIGINT, got ${lk.dataType}/${rk.dataType}")
    require(lts.dataType == TimestampType && rts.dataType == TimestampType,
      s"asofJoin ts must be TIMESTAMP, got ${lts.dataType}/${rts.dataType}")
    GraftSqlBridge.dataset(spark,
      AsOfJoinNode(lPlan, rPlan, lk, lts, rk, rts,
        AttributeReference(rightTs, TimestampType, nullable = true)()))
  }

  /** q51's exact query shape through the native operator — shares
    * q51's DuckDB `ASOF JOIN` oracle, so the custom plan is held to
    * the same hash gate as the composed formulation. */
  def q76AsofNative(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
    val signups = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    asofJoin(events, signups, key = "user_id", ts = "ts")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("asof_ts")).as("n_with_signup"),
        max(unix_micros(col("ts")) - unix_micros(col("asof_ts")))
          .as("max_lag_us"))
      .orderBy(col("event_type"))
  }
}
