package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._

/** STRING ZONE-MAP STATS (q350) — the r12 verdict's #7 ask: the
  * zone-map manifest tier (q307/q336) prunes on numeric x/y and a
  * bloom over one int key, but real curation probes filter on
  * language / source / date STRINGS. This adds per-file min/max
  * string stats with Iceberg's `truncate[n]` transform — bounds are
  * stored over the first [[TruncLen]] characters, which caps
  * manifest width on arbitrarily long strings while staying a
  * CORRECT bound, because prefix truncation is monotone under
  * lexicographic order: min_trunc = trunc(min_s) <= trunc(s) <=
  * trunc(max_s) = max_trunc for every s in the file
  * (Iceberg spec §Appendix-B "truncate" transform; same math).
  *
  * Layout: documents sorted by (source, lang, doc_id) into
  * fixed-size files ([[Scale.globalIndex]] — the distributed file-id
  * assignment every layout writer here uses). The manifest carries,
  * per file: row count, full min/max of `lang` (2-char codes — no
  * truncation needed) and truncate[4] min/max of `source`. The
  * truncation is doing real work in this fixture: `src1` and
  * `src10..src13` collapse to the same 4-char prefix, so an
  * equality probe on `src12` keeps every file whose truncated range
  * admits `src1` — conservative, never wrong, exactly the bound a
  * truncated stat promises.
  *
  * Maintenance is INCREMENTAL (the q336 rule): an arriving batch
  * lays out into fresh file ids and appends its own manifest rows
  * derived from THAT BATCH ONLY — the standing corpus is neither
  * read nor restatted. The probe report is falsifiable the q307
  * way: every row is computed from the real pruned read, and the
  * oracle re-derives it from the bare predicates over the same
  * (base + synthesized fresh) corpus, so a manifest that under- or
  * over-prunes hash-fails. TableFormatSpec asserts the
  * partitions-read story separately: a source-equality probe reads
  * only stats-overlapping files, and a fresh-prefix probe reads
  * only the appended files. */
object StringZonemap {

  private[graft] val SzData = "graft_zmap_data_sz"
  private[graft] val SzManifest = "graft_zmap_manifest_sz"
  private[graft] val TruncLen = 4

  private[graft] def truncc(c: Column): Column = substring(c, 1, TruncLen)

  private def srzRowsPerFile(n: Long): Long = math.max(16L, (n + 47L) / 48L)

  /** Manifest rows derived from ONE laid-out batch — the single
    * stats producer for both the initial build and every append, so
    * incremental maintenance can't drift from the build path. */
  private def manifestRows(laid: DataFrame): DataFrame =
    laid.groupBy(col("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("lang")).as("min_lang"), max(col("lang")).as("max_lang"),
        min(truncc(col("source"))).as("min_src_t"),
        max(truncc(col("source"))).as("max_src_t"))

  private def layOut(docs: DataFrame, rpf: Long,
      fileBase: Int): DataFrame =
    Scale.globalIndex(docs, col("source").asc, col("lang").asc,
        col("doc_id").asc)
      .withColumn("zfile",
        expr(s"CAST($fileBase + (rank - 1) div $rpf AS INT)"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), col("zfile"))

  /** The synthesized fresh batch: doc_ids shifted out of the corpus
    * keyspace, sources re-prefixed `zz` so the batch occupies a
    * disjoint region of the string stats space (a new ingest feed's
    * namespace). Shared with the oracle's UNION ALL re-derivation. */
  private[graft] def freshBatch(spark: SparkSession,
      dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("lang"),
        concat(lit("zz"), col("source")).as("source"), col("n_chars"))

  private[graft] def build(spark: SparkSession, dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val rpf = srzRowsPerFile(docs.count())
    val laid = layOut(docs, rpf, 0).localCheckpoint()
    Scale.dropManaged(spark, SzData)
    Scale.dropManaged(spark, SzManifest)
    laid.write.partitionBy("zfile")
      .mode(SaveMode.Overwrite).saveAsTable(SzData)
    manifestRows(laid).write.mode(SaveMode.Overwrite)
      .saveAsTable(SzManifest)

    // incremental append: fresh batch -> fresh file ids; manifest
    // rows come from the batch, never from re-scanning the corpus
    val maxFile = spark.table(SzManifest)
      .agg(max(col("zfile"))).collect().head.getInt(0)
    val fresh = layOut(freshBatch(spark, dir), rpf, maxFile + 1)
      .localCheckpoint()
    fresh.write.insertInto(SzData)
    manifestRows(fresh).write.insertInto(SzManifest)
  }

  /** A probe: label, manifest pruning rule (truncated-bound
    * arithmetic), residual row predicate. */
  private[graft] case class Probe(label: String, keep: Column,
      residual: Column)

  private[graft] def probes: Seq[Probe] = {
    def eqSrc(v: String) = Probe(s"eq_source_$v",
      lit(v.take(TruncLen)).between(col("min_src_t"), col("max_src_t")),
      col("source") === v)
    Seq(
      eqSrc("src7"),
      // truncation collapse: src12 shares prefix 'src1' with
      // src1/src10/src11/src13 — the rule keeps their files too
      // (conservative), the residual filter restores exactness
      eqSrc("src12"),
      Probe("range_source_src2_src4",
        col("max_src_t") >= lit("src2".take(TruncLen)) &&
          col("min_src_t") <= lit("src4".take(TruncLen)),
        col("source") >= "src2" && col("source") <= "src4"),
      Probe("eq_source_lang",
        lit("src3".take(TruncLen))
          .between(col("min_src_t"), col("max_src_t")) &&
          lit("zh").between(col("min_lang"), col("max_lang")),
        col("source") === "src3" && col("lang") === "zh"),
      // the fresh-feed namespace: only appended files qualify
      Probe("fresh_prefix_zz",
        col("max_src_t") >= "zz",
        col("source").startsWith("zz")))
  }

  /** Files whose stats admit the probe — manifest-only arithmetic;
    * shared by the query and the spec's partitions-read assertion. */
  private[graft] def overlappingFiles(spark: SparkSession,
      p: Probe): Seq[Int] =
    spark.table(SzManifest).filter(p.keep)
      .select(col("zfile")).collect().map(_.getInt(0)).toSeq.sorted

  /** Pruned read of one probe — stats route the file list, the
    * residual predicate restores exactness inside kept files. */
  private[graft] def prunedRead(spark: SparkSession,
      p: Probe): DataFrame = {
    val files = overlappingFiles(spark, p)
    spark.table(SzData)
      .filter(col("zfile").isin(files: _*))
      .filter(p.residual)
  }

  def q350StringZonemap(spark: SparkSession, dir: String): DataFrame = {
    build(spark, dir)
    probes.map { p =>
      prunedRead(spark, p)
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .select(lit(p.label).as("probe"), col("n_docs"),
          col("sum_chars"), col("n_sources"))
    }.reduce(_ unionByName _).orderBy(col("probe"))
  }
}
