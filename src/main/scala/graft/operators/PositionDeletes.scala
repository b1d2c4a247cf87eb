package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._

/** POSITION DELETES — the second Iceberg delete-artifact kind, closing
  * the r11 verdict's #3 residual: q317's equality deletes are
  * key-valued (a takedown names WHAT to remove); a CoW-avoiding writer
  * that just rewrote or merged rows knows exactly WHERE they live and
  * emits (file, row-ordinal) artifacts instead — no key column needed,
  * no key index consulted, O(1) per deleted row. A real table carries
  * BOTH kinds simultaneously, and its read path must merge them. (The
  * reference cannot express a row delete at all — its load is a whole
  * `mode("overwrite")` per run, ref `etl/load.py:80-84` — so any
  * correction rewrites everything; artifact deletes are the 100 TB
  * replacement for exactly that.)
  *
  * Fixture: the three-commit orders table with an explicit per-segment
  * `pos` ordinal (rank by key within the segment). In a real format
  * the ordinal is implicit in the file's row order — a writer gets it
  * for free while writing; materializing it here is the local-FS
  * stand-in (partition directory = file), exactly like the zone-map
  * tier's `zfile`. Lifecycle:
  *
  *  - v1: base commits c0/c1/c2 (date-cut, per-segment stats).
  *  - v2: equality batch `eq1` (keys %1000=41, stats-routed by date —
  *    the q317 takedown shape).
  *  - v3: position batch `pos1`: ordinals ≡ 7 (mod 20) of segment c1
  *    — the write shape of an updater that touched those rows.
  *  - fold: per-segment delete density counts BOTH kinds against the
  *    stats ledger (artifact ÷ metadata, no data read to decide);
  *    only c1 (~5% pos + ~0.1% eq) crosses [[PdFoldThreshold]] and
  *    rewrites to `c1_f` with both kinds applied — and with FRESH
  *    ordinals, because a rewritten file is a new file: its old
  *    position artifacts can never apply again (they go inert by the
  *    same scope rule as q317's, not by a second code path).
  *  - v4 swaps c1_f in; eq rows targeting c0/c2 stay live.
  *
  * One read path serves every version ([[pdRead]]): untouched
  * segments are read DIRECTLY; touched segments pay two broadcast
  * anti-joins — (key, segment) against the equality rows, (pos,
  * segment) against the position rows. Set-minus semantics make the
  * kinds compose: a row named by both disappears once (the spec
  * asserts v3 ≡ v4 content byte-for-byte, i.e. the fold applied
  * exactly what the artifacts said). At 100 TB position deletes are
  * the cheap path for write-heavy tables: the artifact is a couple of
  * integers per row, routing is exact (the writer KNEW the file), and
  * the merged read still touches only artifact-targeted files. */
object PositionDeletes {

  private[graft] val PdData = "graft_pd_data"
  private[graft] val PdManifest = "graft_pd_manifest"
  private[graft] val PdSegstats = "graft_pd_segstats"
  private[graft] val PdDeletes = "graft_pd_deletes"
  private[graft] val PdDManifest = "graft_pd_dmanifest"

  private[graft] val PdFoldThreshold = 0.04

  private val C0End = "1997-01-01"
  private val C1End = "1999-01-01"

  /** Read one version through the merged path: (rows, scoped eq rows,
    * scoped pos rows). Segments no scoped artifact targets are read
    * directly; touched segments pay one broadcast anti-join per
    * artifact KIND present. */
  private[graft] def pdRead(spark: SparkSession,
      version: Int): (DataFrame, DataFrame, DataFrame) =
    pdReadMeta(spark,
      TableFormat.morMetaAt(spark, PdManifest, PdDeletes, PdDManifest,
        Seq(version)), version)

  /** [[pdRead]] planned from pre-collected metadata (r15 opt): the
    * per-version report loops issue 3 collects TOTAL instead of 3 per
    * version; `touched` derives from the meta exactly as the collected
    * distinct target set did. */
  private[graft] def pdReadMeta(spark: SparkSession,
      meta: TableFormat.MorMeta,
      version: Int): (DataFrame, DataFrame, DataFrame) = {
    val commits = meta.commits.getOrElse(version, Set.empty).toSeq
    val dbs = meta.dbatches.getOrElse(version, Set.empty).toSeq.sorted
    val scoped = spark.table(PdDeletes)
      .filter(col("dbatch").isin(dbs: _*))
      .filter(col("target_commit").isin(commits: _*))
    val eq = scoped.filter(col("kind") === "eq")
    val pos = scoped.filter(col("kind") === "pos")
    val touched = dbs
      .flatMap(meta.batchTargets.getOrElse(_, Set.empty[String]))
      .toSet.intersect(commits.toSet).toSeq.sorted
    val direct = spark.table(PdData)
      .filter(col("commit_id").isin(
        commits.filterNot(touched.contains): _*))
    val merged = spark.table(PdData)
      .filter(col("commit_id").isin(touched: _*))
      .join(broadcast(eq),
        col("o_orderkey") === col("del_key") &&
          col("commit_id") === col("target_commit"), "left_anti")
      .join(broadcast(pos),
        col("pos") === col("del_pos") &&
          col("commit_id") === col("target_commit"), "left_anti")
    (direct.unionByName(merged), eq, pos)
  }

  /** Build the full mixed-artifact lifecycle; returns nothing — the
    * tables are the state (shared by q339 and the spec). */
  private[graft] def buildLifecycle(spark: SparkSession,
      dir: String): Unit = {
    import spark.implicits._
    Seq(PdData, PdManifest, PdSegstats, PdDeletes, PdDManifest)
      .foreach(Scale.dropManaged(spark, _))

    // v1: date-cut commits, each with per-segment ordinals. The
    // window is per-SEGMENT (a real writer assigns ordinals per file
    // while streaming the file out — free at any scale; the window is
    // the fixture's stand-in for that implicit order).
    val seg = when(col("o_orderdate") < lit(C0End).cast("timestamp"), "c0")
      .when(col("o_orderdate") < lit(C1End).cast("timestamp"), "c1")
      .otherwise("c2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("commit_id")).orderBy(col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      .withColumn("commit_id", seg)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .write.partitionBy("commit_id")
      .mode(SaveMode.Overwrite).saveAsTable(PdData)
    spark.table(PdData).groupBy(col("commit_id"))
      .agg(min(col("o_orderdate")).as("min_ts"),
        max(col("o_orderdate")).as("max_ts"),
        count(lit(1)).as("n_rows"))
      .write.mode(SaveMode.Overwrite).saveAsTable(PdSegstats)
    val live = Seq("c0", "c1", "c2")
    live.map((1, _)).toDF("version", "commit_id")
      .write.mode(SaveMode.Overwrite).saveAsTable(PdManifest)
    Seq.empty[(Int, String)].toDF("version", "dbatch")
      .write.mode(SaveMode.Overwrite).saveAsTable(PdDManifest)

    // v2: equality batch eq1 — keys %1000=41, stats-routed (q317's
    // shared routing), kind-tagged, null ordinal
    TableFormat.routeDeletes(spark, PdSegstats, live,
      Tables.orders(spark, dir)
        .filter(col("o_orderkey") % 1000 === 41)
        .select(col("o_orderkey"), col("o_orderdate")), "eq1")
      .select(lit("eq").as("kind"), col("del_key"),
        lit(null).cast("long").as("del_pos"), col("target_commit"),
        col("dbatch"))
      .write.partitionBy("dbatch")
      .mode(SaveMode.Overwrite).saveAsTable(PdDeletes)
    live.map((2, _)).toDF("version", "commit_id")
      .write.insertInto(PdManifest)
    Seq((2, "eq1")).toDF("version", "dbatch").write.insertInto(PdDManifest)

    // v3: position batch pos1 — ordinals ≡ 7 (mod 20) of c1. The
    // writer knows file and ordinal, so there is NO routing step and
    // no key column: the artifact is (target file, ordinal) pairs,
    // derived here from the ledger row count alone (metadata!) — the
    // data is not read to produce it.
    val n1 = spark.table(PdSegstats).filter(col("commit_id") === "c1")
      .select(col("n_rows")).collect().head.getLong(0)
    spark.range(n1).select(col("id"))
      .filter(col("id") % 20 === 7)
      .select(lit("pos").as("kind"),
        lit(null).cast("long").as("del_key"), col("id").as("del_pos"),
        lit("c1").as("target_commit"), lit("pos1").as("dbatch"))
      .write.insertInto(PdDeletes)
    live.map((3, _)).toDF("version", "commit_id")
      .write.insertInto(PdManifest)
    Seq((3, "eq1"), (3, "pos1")).toDF("version", "dbatch")
      .write.insertInto(PdDManifest)

    // fold: density counts BOTH kinds per segment (artifact ÷ ledger,
    // no data read to decide); only c1 crosses. The rewrite applies
    // the merged read path to exactly that segment and assigns FRESH
    // ordinals — a new file's row order is its own.
    val (_, eq3, pos3) = pdRead(spark, 3)
    val density = eq3.select(col("target_commit"))
      .unionByName(pos3.select(col("target_commit")))
      .groupBy(col("target_commit")).agg(count(lit(1)).as("n_del"))
      .join(spark.table(PdSegstats)
        .select(col("commit_id").as("target_commit"), col("n_rows")),
        "target_commit")
      .filter(col("n_del") >= col("n_rows") * PdFoldThreshold)
      .select(col("target_commit")).collect().map(_.getString(0))
      .toSeq.sorted
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("commit_id")).orderBy(col("o_orderkey"))
    density.foreach { c =>
      spark.table(PdData).filter(col("commit_id") === c)
        .join(broadcast(eq3.filter(col("target_commit") === c)),
          col("o_orderkey") === col("del_key"), "left_anti")
        .join(broadcast(pos3.filter(col("target_commit") === c)),
          col("pos") === col("del_pos"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), lit(s"${c}_f").as("commit_id"))
        .withColumn("pos", row_number().over(wf).cast("long") - 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("pos"), col("commit_id"))
        .write.insertInto(PdData)
    }
    val v4 = (live.filterNot(density.contains) ++ density.map(_ + "_f"))
      .sorted
    v4.map((4, _)).toDF("version", "commit_id")
      .write.insertInto(PdManifest)
    Seq((4, "eq1"), (4, "pos1")).toDF("version", "dbatch")
      .write.insertInto(PdDManifest)
  }

  /** q339: the per-version report over the mixed-artifact table —
    * n_rows / sum_price counted from the real merged reads,
    * n_live_eq / n_live_pos from the scoped artifacts. v3 and v4
    * must agree on content (the fold applied exactly the artifacts)
    * while the live-artifact counts collapse — both facts are in the
    * hash, and the oracle re-derives everything from the date cuts,
    * the key predicate, and the same rank-within-segment ordinal
    * arithmetic. */
  def q339PositionDeletes(spark: SparkSession, dir: String): DataFrame = {
    buildLifecycle(spark, dir)
    // one metadata pass plans all four reported versions (r15 opt)
    val meta = TableFormat.morMetaAt(spark, PdManifest, PdDeletes,
      PdDManifest, 1 to 4)
    Seq((1, "base"), (2, "eq"), (3, "eq+pos"), (4, "folded")).map {
      case (v, status) =>
        val (rows, eq, pos) = pdReadMeta(spark, meta, v)
        rows.agg(count(lit(1)).as("n_rows"),
            dsum(col("o_totalprice")).as("sum_price"))
          .crossJoin(eq.agg(count(lit(1)).as("n_live_eq")))
          .crossJoin(pos.agg(count(lit(1)).as("n_live_pos")))
          .select(lit(v).as("version"), lit(status).as("status"),
            col("n_rows"), col("sum_price"), col("n_live_eq"),
            col("n_live_pos"))
    }.reduce(_ unionByName _).orderBy(col("version"))
  }
}
