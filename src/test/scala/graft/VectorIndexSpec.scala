package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, VectorIndex}

/** Contracts of the persisted vector-index lifecycle (q294–q296) and
  * the portable-SimHash certificate (q297): the probe must consume the
  * standing artifact with pruning and no index-side exchange, append
  * must be invisible under the frozen model, and the approximate
  * probes must clear measured recall floors against brute force. */
class VectorIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def exactTop3: Set[(Long, Long)] = {
    val e = Similarity.embDouble(spark, sf)
    val pr = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("pv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(pr), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (Similarity.dotD(col("pv"), col("v")) /
          (Similarity.normD(col("pv")) * Similarity.normD(col("v"))))
          .as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("q294 probe prunes unprobed cells at file listing and pays " +
      "no exchange on the index side") {
    val df = VectorIndex.q294IvfPersistedProbe(spark, sf)
    df.collect() // partitions-read is a runtime fact
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    val idxScans = scans(finalPlan).filter(
      _.tableIdentifier.exists(_.table == "graft_ivf_index"))
    assert(idxScans.nonEmpty, finalPlan.toString.take(3000))
    // the partition filter carries the STATIC probed-cell predicate
    // (cid IN (...)), the file-listing pruning guarantee
    assert(idxScans.head.partitionFilters.exists(
      _.toString.toLowerCase.contains("cid") ),
      idxScans.head.partitionFilters.mkString("\n"))
    // cells actually read == distinct cells the probe selection picks
    // (re-derived from the persisted tables, not from plan internals)
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d"), col("cid"))
    val probedCells = Similarity.embDouble(spark, sf)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("pv"))
      .crossJoin(spark.table("graft_ivf_centroids"))
      .withColumn("d",
        round(Similarity.sqDist(col("pv"), col("c")), 9))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= 2)
      .select(col("cid")).distinct().count()
    assert(idxScans.head.metrics("numPartitions").value == probedCells,
      s"read ${idxScans.head.metrics("numPartitions").value} " +
        s"partitions, probe selects $probedCells cells")
    assert(probedCells < 8, "probe selection must not touch every cell")
    // index side of the join: scan → (filter) → join, no exchange
    def hasExchange(p: SparkPlan): Boolean = p match {
      case q: QueryStageExec => hasExchange(q.plan)
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        true
      case o => o.children.exists(hasExchange)
    }
    // plain collect() never enters AQE query stages — descend explicitly
    def joins(p: SparkPlan): Seq[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec] =
      p match {
        case q: QueryStageExec => joins(q.plan)
        case j: org.apache.spark.sql.execution.joins
            .BroadcastHashJoinExec => Seq(j)
        case o => o.children.flatMap(joins)
      }
    val probeJoins = joins(finalPlan)
    assert(probeJoins.nonEmpty, finalPlan.toString.take(3000))
    assert(!hasExchange(probeJoins.head.left),
      "index side of the probe join must be exchange-free")
  }

  test("q295 append leaves the persisted model frozen and makes the " +
      "appended index equal a rebuild under the same centers") {
    val probeAppended = VectorIndex.q295IvfAppendProbe(spark, sf)
      .collect().map(_.toSeq).toSeq
    // model freeze: the centroid table equals retraining on the base
    // slice alone — the append wrote vectors, never centers
    val persisted = spark.table("graft_ivf_centroids_app")
      .orderBy(col("cid")).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val retrained = Similarity.centersOf(
      Similarity.embDouble(spark, sf).filter(col("vec_id") % 10 =!= 7), 8)
    assert(persisted == retrained)
    // coverage: base + appended batch = the full corpus, exactly once
    val idxCount = spark.table("graft_ivf_index_app").count()
    val corpus = Tables.embeddings(spark, sf).count()
    assert(idxCount == corpus)
    // append invisibility: probing the appended index equals probing a
    // from-scratch assignment of the full corpus under the SAME frozen
    // centers (what the DuckDB oracle also pins, asserted here in-plan)
    val assignedAll = Similarity.lloydAssign(
      Similarity.embDouble(spark, sf), persisted)
      .select(col("vec_id"), col("cid"))
    val fromTable = spark.table("graft_ivf_index_app")
      .select(col("vec_id"), col("cid"))
    assert(fromTable.exceptAll(assignedAll).isEmpty &&
      assignedAll.exceptAll(fromTable).isEmpty)
    assert(probeAppended.nonEmpty)
  }

  test("q296 persists the real PQ artifact shapes and its probe " +
      "clears a measured recall floor") {
    val probe = VectorIndex.q296PqPersistedProbe(spark, sf).collect()
    // artifact shapes: 4 codebooks × 8 centroids × 16 dims; one
    // 4-code row per corpus vector, codes in [0, 8)
    val cb = spark.table("graft_pq_codebooks").collect()
    assert(cb.length == 32)
    assert(cb.forall(_.getSeq[Double](2).length == 16))
    val codes = spark.table("graft_pq_codes")
    assert(codes.count() == Tables.embeddings(spark, sf).count())
    assert(codes.filter(size(col("codes")) =!= 4).isEmpty)
    assert(codes.filter(exists(col("codes"),
      c => c < 0 || c >= 8)).isEmpty)
    // measured floor: 0.667 at sf0.001 with the 20-wide shortlist;
    // 0.4 fails if a regression halves it (the q213 discipline)
    val hits = probe.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (hits & exactTop3).size.toDouble / exactTop3.size
    assert(recall >= 0.4, s"PQ-from-persisted recall@3 = $recall")
  }

  test("q294 probe-from-persisted clears the IVF recall floor") {
    val probe = VectorIndex.q294IvfPersistedProbe(spark, sf).collect()
    val hits = probe.map(r => (r.getLong(0), r.getLong(2))).toSet
    // measured 0.933 at sf0.001 (nprobe = 2 of 8 cells)
    val recall = (hits & exactTop3).size.toDouble / exactTop3.size
    assert(recall >= 0.6, s"IVF-from-persisted recall@3 = $recall")
  }

  test("q298 monitor consumes the persisted model: one narrow corpus " +
      "pass, no training scans in the monitor's plan") {
    val df = VectorIndex.q298IvfDriftMonitor(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    // the model rides as a LITERAL loaded from the persisted centroid
    // table (readCenters), so the monitor's plan is exactly one scan —
    // the embeddings corpus — and touches neither the index table nor
    // a second (training) pass over the corpus
    val ss = scans(finalPlan)
    assert(ss.length == 1, finalPlan.toString.take(3000))
    assert(ss.head.tableIdentifier.isEmpty &&
      !ss.head.toString.contains("graft_ivf"),
      "monitor must scan only the embeddings parquet")
    // and the literal it carries IS the persisted model, byte-for-byte
    // (the monitor owns its _mon suffix — it must not clobber q295's
    // _app artifact)
    val persisted = spark.table("graft_ivf_centroids_mon")
      .orderBy(col("cid")).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    assert(finalPlan.toString.contains(persisted.head.head.toString),
      "monitor plan must embed the persisted centroid literal")
  }

  test("q301 compaction leaves exactly one file in every touched cell " +
      "and is invisible to the probe") {
    val probe = VectorIndex.q301IvfCompaction(spark, sf)
      .collect().map(_.toSeq).toSeq
    // compaction invisibility: identical to the append-path probe
    val appendProbe = VectorIndex.q295IvfAppendProbe(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(probe == appendProbe)
    // touched cells, re-derived from the persisted artifacts
    val centers = spark.table("graft_ivf_centroids_cpt")
      .orderBy(col("cid")).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val touched = Similarity.lloydAssign(
        Similarity.embDouble(spark, sf).filter(col("vec_id") % 10 === 7),
        centers)
      .select(col("cid")).distinct().collect().map(_.getInt(0)).toSeq
    assert(touched.nonEmpty)
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("graft_ivf_index_cpt"))
      .location
    val fs = org.apache.hadoop.fs.FileSystem.get(loc,
      spark.sparkContext.hadoopConfiguration)
    touched.foreach { c =>
      val dir = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(loc), s"cid=$c")
      val files = fs.listStatus(dir)
        .filter(_.getPath.getName.startsWith("part-"))
      assert(files.length == 1,
        s"cell $c has ${files.length} files after compaction")
    }
  }

  test("q302 consumes the drift flags: a strict subset of cells is " +
      "flagged and retrained, unflagged centroids stay frozen, " +
      "population is conserved") {
    val rows = VectorIndex.q302IvfDriftRebuild(spark, sf).collect()
    assert(rows.length == 8)
    val flagged = rows.filter(_.getBoolean(1)).map(_.getInt(0)).toSet
    assert(flagged.nonEmpty, "drift injection must flag at least one cell")
    assert(flagged.size < 8, "only a strict subset may be flagged")
    // conservation: the affected-cell rewrite loses/duplicates nothing
    assert(rows.map(_.getLong(2)).sum == rows.map(_.getLong(3)).sum)
    assert(rows.map(_.getLong(2)).sum ==
      Tables.embeddings(spark, sf).count())
    assert(spark.table("graft_ivf_index_rb").count() ==
      Tables.embeddings(spark, sf).count())
    // flagged cells moved their centroid; unflagged report zero shift
    rows.foreach { r =>
      if (r.getBoolean(1)) assert(r.getDouble(4) > 0.0)
      else assert(r.getDouble(4) == 0.0)
    }
    // the model table was version-bumped IN PLACE: unflagged rows
    // equal the base retrain byte-for-byte, flagged rows moved
    val base = Similarity.centersOf(
      Similarity.embDouble(spark, sf).filter(col("vec_id") % 10 =!= 7), 8)
    val persisted = spark.table("graft_ivf_centroids_rb")
      .orderBy(col("cid")).collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    (0 until 8).foreach { i =>
      if (flagged(i)) assert(persisted(i) != base(i))
      else assert(persisted(i) == base(i))
    }
  }

  test("q297 measures the md5-SimHash tier against the exact Jaccard " +
      "relation: bands partition q289's pairs, recall in [0,1]") {
    val rows = Dedup.q297SimhashRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    val nExact = rows.map(_.getLong(1)).sum
    val exactPairs = Dedup.q289PrefixJaccardJoin(spark, sf).count()
    assert(nExact == exactPairs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // found ≤ exact per band
      val recall = r.getDouble(3)
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("q303 nprobe curve is monotone non-decreasing and exact at " +
      "nprobe = k") {
    val rows = VectorIndex.q303IvfNprobeCurve(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getDouble(4)).toSeq
    // visible-cell sets are nested in nprobe, so adding cells can
    // only add true top-3 members to the shortlist
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(a <= b, s"recall curve not monotone: $recalls")
    }
    assert(recalls.last == 1.0d,
      s"probing all k cells must be exact, got ${recalls.last}")
    // the serving default's point on the curve backs q294's floor
    assert(recalls(1) >= 0.6, s"recall@3 at nprobe=2 = ${recalls(1)}")
    rows.foreach(r => assert(r.getLong(3) == r.getLong(1) * 3))
  }

  test("q304 stream gate is STATELESS and emits true near-dup " +
      "witnesses: every pair is in the exact cross relation at the " +
      "q30 threshold") {
    val (df, stateRows) = graft.streaming.StreamVectorGate.gate(spark, sf)
    val gate = df.collect()
    assert(gate.nonEmpty)
    // one cell per indexed vector ⇒ no duplicate candidate path ⇒ no
    // pair-dedup state: the streaming query must hold ZERO state rows
    // (q217's banded gate, by contrast, holds one row per pair seen)
    assert(stateRows == 0L, s"vector gate held $stateRows state rows")
    // exact new-vs-base near-dup relation (no cell constraint): the
    // gate's emissions must be a subset — the 2-cell probe can MISS
    // a straddling pair but never invent one, and the witness cosine
    // must be the true cosine
    val e = Similarity.embDouble(spark, sf)
    val nv = e.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id").as("vec_new"), col("v").as("nv"))
    val base = e.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id").as("vec_dup"), col("v").as("bv"))
    val exact = nv.join(broadcast(base),
        round(Similarity.dotD(col("nv"), col("bv")) /
          (Similarity.normD(col("nv")) * Similarity.normD(col("bv"))), 9)
          >= 0.45)
      .select(col("vec_new"), col("vec_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val emitted = gate.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted.size == gate.length, "gate emitted a duplicate pair")
    assert(emitted.subsetOf(exact),
      s"gate invented pairs: ${emitted -- exact}")
    gate.foreach(r => assert(r.getDouble(2) >= 0.45))
    info(s"gate recall vs exact relation: ${emitted.size}/${exact.size}")
  }

  test("q305 deletion propagates into the index: victims fully " +
      "erased, bystanders kept, model frozen") {
    val report = VectorIndex.q305IvfDeletion(spark, sf).collect()
    assert(report.nonEmpty)
    assert(report.exists(_.getLong(2) > 0), "request hit no cell")
    // the reported n_after is COUNTED from the rewritten table, so
    // this arithmetic holding means no bystander was dropped and no
    // victim survived
    report.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2),
        s"cell ${r.getInt(0)}: ${r.getLong(1)} - ${r.getLong(2)} " +
          s"!= ${r.getLong(3)}")
      assert(r.getBoolean(4) == (r.getLong(2) > 0))
    }
    // ERASURE: no deleted vec_id remains anywhere in the artifact
    val residual = spark.table("graft_ivf_index_del")
      .filter(col("vec_id") % 10 === 3).count()
    assert(residual == 0L, s"$residual deleted vectors still indexed")
    // model frozen: erasure must not refresh training signal
    val persisted =
      VectorIndex.readCenters(spark, "graft_ivf_centroids_del", 8)
    val fresh = Similarity.centersOf(Similarity.embDouble(spark, sf), 8)
    assert(persisted == fresh, "deletion retrained the model")
  }

  test("q306 gate-recall certificate is consistent with the gate it " +
      "grades: n_caught equals q304's actual emission count") {
    val r = VectorIndex.q306GateRecall(spark, sf).collect().head
    val (nExact, nCaught) = (r.getLong(0), r.getLong(1))
    assert(nExact > 0)
    assert(nCaught == r.getLong(2) + r.getLong(3)) // rank1 + rank2
    assert(nCaught <= nExact)
    val recall = r.getDouble(4)
    assert(recall >= 0.0 && recall <= 1.0)
    // the certificate's caught count must equal what the REAL
    // streaming gate emits — certificate and gate share the frozen
    // model, the 2-cell probe and the threshold by construction
    val emitted = graft.streaming.StreamVectorGate
      .q304StreamIvfGate(spark, sf).count()
    assert(nCaught == emitted,
      s"certificate says $nCaught caught, gate emitted $emitted")
    info(s"gate recall $recall ($nCaught/$nExact; " +
      s"rank1 ${r.getLong(2)}, rank2 ${r.getLong(3)})")
  }

  test("q327 plans from the manifest diff: the corpus is scanned only " +
      "at the fresh partition, provenance rides through maintenance, " +
      "and the composed cycle equals q302's from-scratch derivation") {
    val got = VectorIndex.q327ChangelogIvfMaintenance(spark, sf)
      .collect()
    // churn-only corpus read: the ONE production definition lists
    // exactly the manifest-diff partition, of the table's four
    val churn = VectorIndex.vdChurn(spark)
    churn.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    val plan = churn.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val cs = scans(plan).filter(
      _.tableIdentifier.exists(_.table == VectorIndex.VdData))
    assert(cs.nonEmpty)
    assert(cs.head.metrics("numPartitions").value == 1,
      s"churn read touched ${cs.head.metrics("numPartitions").value}")
    assert(spark.sql(s"SHOW PARTITIONS ${VectorIndex.VdData}")
      .count() == 4)
    // provenance: the appended rows carry the fresh commit id, and
    // it survives the drift rebuild's cell rewrites
    val newCount = spark.table(VectorIndex.VdIndex)
      .filter(col("src_commit") === "e3").count()
    assert(newCount ==
      Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 7)
        .count())
    // composition invisible: identical report to the
    // fixture-predicate cycle (same split, same maintenance)
    val direct = VectorIndex.q302IvfDriftRebuild(spark, sf).collect()
    assert(got.toSeq.map(_.toSeq) == direct.toSeq.map(_.toSeq),
      "changelog-planned maintenance diverged from the from-scratch cycle")
    // version-binding stamps: the index bound v1 at build, re-bound
    // v2 after the churn append (the drift rebuild is artifact-
    // internal maintenance at the same bound version)
    assert(graft.operators.TableFormat.latestBindings(spark,
      VectorIndex.VdBindings) ==
      Map(VectorIndex.VdIndex -> (VectorIndex.VdManifest, 2)))
    assert(spark.table(VectorIndex.VdBindings).count() == 2)
  }
}
