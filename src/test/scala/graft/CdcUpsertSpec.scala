package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CdcUpsert, TableFormat}

/** Contracts of the CDC upsert tier (q337/q338) the DuckDB hash gate
  * cannot see: replay byte-stability of a trigger, loud failure on an
  * order gap, and the churn-only read discipline of the row-level
  * change feed. */
class CdcUpsertSpec extends AnyFunSuite {
  import TestSpark._

  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  private def scansOf(df: DataFrame, table: String)
      : Seq[FileSourceScanExec] = {
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case q: QueryStageExec => go(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(go)
    }
    go(finalPlan).filter(_.tableIdentifier.exists(_.table == table))
  }

  private def stateHash(): (Long, Long) = {
    val rep = CdcUpsert.versionReport(spark).collect()
    val arts = spark.table(CdcUpsert.CuDeletes)
      .agg(count(lit(1)), sum(col("del_key"))).collect().head
    (rep.map(_.toString.hashCode.toLong).sum,
      arts.getLong(0) * 31 + arts.getLong(1))
  }

  test("q337 a replayed CDC trigger is byte-identical: re-running a " +
      "tick leaves every version read and every artifact unchanged") {
    CdcUpsert.buildLifecycle(spark, sf)
    val before = stateHash()
    // replay tick 1 (the crash-recovery path: checkpoint lost after
    // the writes landed) — every write is a keyed dynamic overwrite
    CdcUpsert.applyTick(CdcUpsert.tickRows(spark, sf,
      CdcUpsert.Ticks(1)))
    assert(stateHash() == before,
      "replaying tick 1 changed table state")
    // and replay the LAST tick too (manifest head interaction)
    CdcUpsert.applyTick(CdcUpsert.tickRows(spark, sf,
      CdcUpsert.Ticks(2)))
    assert(stateHash() == before,
      "replaying tick 2 changed table state")
  }

  test("q337 an order gap fails loudly instead of publishing a " +
      "version that references unwritten commits — and the gate is " +
      "the MANIFEST, not the data partition (r12 advice)") {
    CdcUpsert.initBase(spark, sf)
    val e = intercept[IllegalArgumentException] {
      // tick 1 arrives before tick 0 ever committed
      CdcUpsert.applyTick(CdcUpsert.tickRows(spark, sf,
        CdcUpsert.Ticks(1)))
    }
    assert(e.getMessage.contains("version 2"), e.getMessage)
    // the crash window the r12 advice named: tick 0 wrote its DATA
    // partition but died before its delete-artifact/manifest writes.
    // A partition-presence gate would wave tick 1 through and
    // version 3 would scope an empty cd0 batch (tick 0's deletes
    // silently dropped); the manifest gate still refuses.
    CdcUpsert.tickRows(spark, sf, CdcUpsert.Ticks(0))
      .filter(col("op").isin("I", "U"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"), lit("u0").as("commit_id"))
      .write.insertInto(CdcUpsert.CuData)
    val e2 = intercept[IllegalArgumentException] {
      CdcUpsert.applyTick(CdcUpsert.tickRows(spark, sf,
        CdcUpsert.Ticks(1)))
    }
    assert(e2.getMessage.contains("version 2"), e2.getMessage)
  }

  test("q337 a mid-drain reader never sees a half-applied batch: " +
      "until the manifest row lands (written LAST), the new version " +
      "is unresolvable and prior versions are byte-stable") {
    import org.apache.spark.sql.SaveMode
    CdcUpsert.initBase(spark, sf)
    val v1Before = CdcUpsert.readState(spark, 1)._1
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect().head.toSeq
    // half-apply tick 0 by hand: the data commit lands, the manifests
    // do NOT (the crash window applyTick's write order creates)
    CdcUpsert.tickRows(spark, sf, CdcUpsert.Ticks.head)
      .filter(col("op").isin("I", "U"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"), lit("u0").as("commit_id"))
      .write.mode(SaveMode.Append).insertInto(CdcUpsert.CuData)
    // version 2 is unresolvable: no manifest row set names it, so its
    // commit set is empty and the read returns nothing
    assert(TableFormat.commitsOf(spark, CdcUpsert.CuManifest, 2).isEmpty)
    assert(TableFormat.readVersion(spark, CdcUpsert.CuData,
      CdcUpsert.CuManifest, 2).count() == 0)
    // and version 1 is byte-stable: its read is pruned to its own
    // commit set, so the orphaned u0 partition is invisible to it
    val v1After = CdcUpsert.readState(spark, 1)._1
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect().head.toSeq
    assert(v1After == v1Before,
      "a half-applied batch changed a published version's read")
  }

  test("q338 change-feed reads are churn-sized: the post side reads " +
      "exactly one commit partition, the pre side only the targeted " +
      "segments") {
    CdcUpsert.q338RowChangeFeed(spark, sf).collect()
    // post side of step t1: one partition (u1)
    val post = spark.table(CdcUpsert.CuData)
      .filter(col("commit_id") === "u1")
    post.collect()
    val postScan = scansOf(post, CdcUpsert.CuData).head
    assert(postScan.metrics("numPartitions").value == 1)
    // pre side of step t1: the artifact targets only b_base, so the
    // pruned read must touch exactly that one partition of the four
    // on disk (b_base, u0, u1, u2)
    val art = spark.table(CdcUpsert.CuDeletes)
      .filter(col("dbatch") === "cd1")
    val targeted = art.select(col("target_commit")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(targeted == Seq("b_base"))
    val pre = spark.table(CdcUpsert.CuData)
      .filter(col("commit_id").isin(targeted: _*))
      .join(broadcast(art),
        col("o_orderkey") === col("del_key") &&
          col("commit_id") === col("target_commit"), "left_semi")
    pre.collect()
    val preScan = scansOf(pre, CdcUpsert.CuData).head
    assert(preScan.metrics("numPartitions").value == 1,
      s"pre side read ${preScan.metrics("numPartitions").value} " +
        "partitions, artifact targets 1")
  }

  test("q351 the SQL table_changes TVF prunes the commit-partitioned " +
      "data scans at runtime: every scan carries a non-trivial " +
      "dynamicpruning filter and none reads the base commit") {
    val df = CdcUpsert.q351TableChangesSql(spark, sf)
    df.collect()
    def finalPlan = df.queryExecution.executedPlan
    val scans = scansOf(df, "graft_cdc_data_cu")
    assert(scans.nonEmpty, finalPlan.toString)
    val total = spark.sql(
      s"SHOW PARTITIONS ${CdcUpsert.CuData}").count()
    scans.foreach { sc =>
      val pf = sc.partitionFilters.mkString(";")
      assert(pf.contains("dynamicpruning#"),
        s"scan lost its runtime pruning filter: $pf")
      assert(sc.metrics("numPartitions").value < total,
        s"scan read all $total commit partitions - base not pruned")
    }
  }
}
