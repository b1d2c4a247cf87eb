package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Reproducible sampling and dataset splitting — the operations every
  * training-data pipeline runs constantly. All of them key on
  * `md5(key)` rather than an RNG: the draw is a pure function of the
  * row, so it is stable across runs, engines, partitionings and
  * cluster sizes (an RNG-based `sample()` is none of those), and
  * shards of a 100 TB corpus can be sampled independently with zero
  * coordination.
  */
object Sampling {

  /** Uniform hex position of a key in [0, 1): the md5 hex string
    * compared against hex-prefix thresholds. '19'≈9.8%, 'cc'≈79.7%,
    * 'e6'≈89.8% of the space. */
  def hashOf(key: Column): Column = md5(key.cast("string"))

  /** Deterministic train/val/test assignment (~80/10/10 by hex
    * thresholds). */
  def assignSplit(key: Column): Column =
    when(hashOf(key) < "cc", "train")
      .when(hashOf(key) < "e6", "val")
      .otherwise("test")

  /** Dataset split audit: document counts per (split, lang) — the
    * sanity report run before any training job. */
  def q55HashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("split", assignSplit(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))

  /** Deterministic sequence packing: assign documents to fixed
    * token-budget bins (2048 tokens) by running token count — the
    * dataset-construction step that turns a document corpus into
    * training sequences. Packing runs WITHIN shards (doc_id mod 8):
    * a global running sum would be one partition doing all the work,
    * while sharded packing parallelizes freely and is the layout a
    * 100 TB corpus needs anyway (one packer per output shard). */
  def q57SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (col("doc_id") % 8).cast("int").as("shard"),
        size(split(graft.functions.Cols.normText(col("text")), " "))
          .cast("long").as("tokens"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .withColumn("bin", expr("(cum_tokens - tokens) div 2048L"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"))
      .orderBy(col("shard"), col("bin"))
  }

  /** Stratified reproducible sample: the "first" 20 documents per
    * language in md5 order — uniform within each stratum, identical
    * on every engine and at every scale. One shuffle on lang; rank
    * evaluation is partition-local (WindowGroupLimit keeps 20/group
    * map-side). */
  def q56StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(hashOf(col("doc_id")).asc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Quality-weighted (importance) sampling: each document's keep
    * probability is a function of its own quality signals — here
    * min(1, n_chars/2000), the "longer docs are likelier kept" curve —
    * and the draw compares the md5-uniform of the doc id against that
    * per-row threshold. Same zero-coordination determinism as q55/q56
    * (pure function of the row), but with non-uniform rates: the
    * upsampling/downsampling primitive behind quality-curriculum
    * dataset builds. The first 8 md5 hex chars give a 32-bit uniform
    * in [0,1) — portable to any engine with md5. */
  def q163WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = conv(substring(hashOf(col("doc_id")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val pKeep = least(lit(1.0), col("n_chars").cast("double") / 2000.0)
    Tables.documents(spark, dir)
      .withColumn("kept", (u < pKeep).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        round(sum(col("kept")).cast("double") /
          count(lit(1)).cast("double"), 9).as("keep_rate"),
        // per-row p rounded then decimal-summed: order-independent
        round(sum(round(least(lit(1.0),
            col("n_chars").cast("double") / 2000.0), 9)
            .cast("decimal(18,9)")).cast("double") /
          count(lit(1)).cast("double"), 9).as("expected_rate"))
      .orderBy(col("lang"))
  }

  /** Split-leakage audit: near-duplicate pairs (q25's banded MinHash
    * candidates, Jaccard-verified) whose two documents landed in
    * DIFFERENT train/val/test splits — the eval-contamination report
    * every dataset release needs (a test doc with a near-identical
    * train twin silently inflates benchmarks; q113 is the n-gram
    * cousin for verbatim overlap). Pair generation stays banded; the
    * split assignment is the same pure md5 function as q55, so the
    * audit is reproducible against any re-materialization. */
  def q158SplitLeakage(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(Tables.documents(spark, dir))
      .select(col("doc_a"), col("doc_b"))
      .withColumn("split_a", assignSplit(col("doc_a")))
      .withColumn("split_b", assignSplit(col("doc_b")))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("split_a") =!= col("split_b")).cast("long"))
          .as("n_leaks"),
        min(col("doc_a")).as("example_doc_a"))
      .orderBy(col("split_a"), col("split_b"))

  /** Deterministic global training order — the "shuffle the corpus"
    * step before sequence packing: adjacent source documents are
    * correlated (same crawl, same site), so training reads the corpus
    * in a pseudo-random permutation. Position = md5 of the doc id:
    * reproducible across runs/engines/cluster sizes, resumable from
    * any rank, and shardable with zero coordination (the same reasons
    * every sampler here keys on md5, not an RNG). Ranks come from
    * [[Scale.globalIndex]] — range-repartition on the hash + per-
    * partition offsets — because a bare `row_number() OVER (ORDER BY
    * hash)` collapses 100 TB onto one task. The writer then lands
    * rank ranges as ordered shards. */
  def q199ShuffleOrder(spark: SparkSession, dir: String): DataFrame =
    Scale.globalIndex(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"),
            hashOf(col("doc_id")).as("shuffle_key")),
        col("shuffle_key").asc, col("doc_id").asc)
      .select(col("rank"), col("doc_id"), col("lang"), col("shuffle_key"))
      .orderBy(col("rank"))

  /** Token-budget data selection — "take the best documents until the
    * budget is spent": rank the corpus by quality tier (q33's buckets,
    * high first) then doc_id, and keep the prefix whose cumulative
    * token count fits half the corpus's total tokens (the budget is a
    * fraction, so the query is scale-free). Emits the per-tier
    * attrition report: total vs kept docs/tokens — high fully kept,
    * the boundary tier partially, the rest dropped.
    *
    * The cumulative sum is the scale hazard: `SUM() OVER (ORDER BY
    * ...)` with no partition collapses the corpus onto one task. This
    * runs the two-level block decomposition instead: per-(tier, block)
    * sums — blocks are doc_id ranges, so (tier, block) segments are
    * contiguous in the global order — then ONE unpartitioned window
    * over the BLOCK table (metadata-sized: n_docs/128 rows, the same
    * "tiny global step" license as q142's grand-total broadcast),
    * whose exclusive prefix becomes each block's offset; the
    * corpus-sized window is partitioned by (tier, block) and the
    * global cumsum is offset + local. ScaleSpec pins the invariant:
    * every unpartitioned Window in this plan sits above an aggregate,
    * never directly on corpus rows. */
  def q225BudgetSelection(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextStats.qualityScored(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_tokens").cast("long").as("tokens"),
        col("quality"))
      .withColumn("tier",
        when(col("quality") === "high", 0)
          .when(col("quality") === "medium", 1)
          .otherwise(2))
      .withColumn("block", expr("doc_id div 128"))
    val blockSums = scored.groupBy(col("tier"), col("block"))
      .agg(sum(col("tokens")).as("block_tokens"))
    val wOff = Window.orderBy(col("tier"), col("block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blockSums
      .withColumn("offset",
        coalesce(sum(col("block_tokens")).over(wOff), lit(0L)))
      .select(col("tier"), col("block"), col("offset"))
    val budget = blockSums.agg(
      expr("sum(block_tokens) div 2").as("budget"))
    val wLocal = Window.partitionBy(col("tier"), col("block"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .join(broadcast(offsets), Seq("tier", "block"))
      .withColumn("cum", col("offset") + sum(col("tokens")).over(wLocal))
      .crossJoin(broadcast(budget))
      .groupBy(col("tier"), col("quality"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tokens_total"),
        sum(when(col("cum") <= col("budget"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("cum") <= col("budget"), col("tokens"))
          .otherwise(0L)).as("tokens_kept"))
      .orderBy(col("tier"))
  }

  /** Output-shard manifest — the layout step that turns a curated
    * corpus into N training shards: each doc hashes to one of 16
    * shards (md5 prefix, engine-portable), and the manifest reports
    * per-shard doc/token totals plus the balance factor
    * (shard_tokens x 16 / total — 1.0 is perfect). Hash sharding is
    * the 100 TB layout answer because balance needs NO global
    * coordination: with millions of docs per shard the law of large
    * numbers bounds skew, and the manifest is the per-run certificate
    * that it did (the spec pins the factor; at sf0.001 tolerance is
    * loose, tightening as corpus size grows). One scan + a 16-row
    * aggregate; the grand total re-aggregates the 16-row manifest, so
    * its attach-back broadcast is metadata-sized by construction. */
  /** Mixture APPLICATION — the enforcement half of the composition
    * reports (q142 measures the mixture, q236 scores its
    * concentration; this query CHANGES it): flatten the language mix
    * by downsampling every language to the smallest language's token
    * mass. Per language, keep rate = min_lang_tokens / lang_tokens;
    * per document, the keep decision is a pure hash of doc_id
    * (md5-prefix uniform in [0,1), the q55/q163 discipline) compared
    * against the language's rate — deterministic across runs,
    * engines, partitionings, and shards, which is what lets a 100 TB
    * corpus apply a mixture with zero coordination: every shard
    * filters independently and the global mix still lands on target.
    *
    * Plan: one corpus pass to (doc, lang, tokens); a |langs|-row
    * aggregate; rates broadcast back; hash filter; final |langs|-row
    * report of kept-vs-target. No shuffle touches corpus rows except
    * the two metadata-sized aggregations. */
  def q244MixtureApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(graft.functions.Cols.normText(col("text")), " "))
          .cast("long").as("tokens"))
    val byLang = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_in"), sum(col("tokens")).as("tokens_in"))
    val minTokens = byLang.agg(min(col("tokens_in")).as("budget"))
    val rates = byLang.crossJoin(broadcast(minTokens))
      .select(col("lang"), col("n_docs_in"), col("tokens_in"),
        least(lit(1.0d),
          col("budget").cast("double") / col("tokens_in").cast("double"))
          .as("rate"))
    // uniform draw: first 6 md5 hex chars of doc_id as an integer in
    // [0, 16^6); exact integer arithmetic then one IEEE division
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 6),
      16, 10).cast("long").cast("double") / lit((1L << 24).toDouble))
    val kept = docs.join(broadcast(rates.select(col("lang"), col("rate"))),
        "lang")
      .filter(u < col("rate"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("tokens")).as("tokens_kept"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs_in"), col("tokens_in"),
        round(col("rate"), 9).as("rate"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .orderBy(col("lang"))
  }

  def q228ShardManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifestFrom(Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(graft.functions.Cols.normText(col("text")), " "))
          .cast("long").as("tokens")))

  /** q228's manifest over a prepared (doc_id, tokens) frame — split out
    * so compositions (q240) can stage the tokenization once and feed
    * several report sections from the same checkpointed pass. */
  private[graft] def shardManifestFrom(toks: DataFrame): DataFrame = {
    val shards = toks
      .select(
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % 16).as("shard"),
        col("tokens"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"))
    val total = shards.agg(sum(col("n_tokens")).as("tot"))
    shards.crossJoin(broadcast(total))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") * 16.0d /
          col("tot").cast("double")).as("balance"))
      .orderBy(col("shard"))
  }

  /** q251: temperature-scaled language mixture with an epoch cap —
    * the UniMax-shaped alternative to q142's equal-target and q244's
    * flatten-to-min: sampling weight ∝ tokens^(1/τ) with τ=2 (i.e.
    * sqrt), which upweights low-resource languages without fully
    * flattening, then an epoch cap (here 1.2×) stops any language
    * from being repeated past the point of memorization risk. The
    * report is what a mixture config bakes in: weight, target token
    * mass at a one-corpus budget, the capped mass, and the implied
    * epoch count (en lands under 1 epoch, small languages cap at 1.2).
    *
    * Scale shape: one corpus tokenize-and-count pass down to a
    * |langs|-row table; everything after is metadata arithmetic on
    * that table (one 1-row normalizer crossJoin). Determinism: per-
    * language token masses are exact BIGINTs; the only cross-row
    * double sum (the sqrt normalizer Z) rounds to 6 decimals before
    * any division, and sqrt itself is IEEE correctly-rounded on both
    * engines, so every derived double is bitwise-portable. */
  def q251TemperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Tables.documents(spark, dir)
      .select(col("lang"),
        size(split(graft.functions.Cols.normText(col("text")), " "))
          .cast("long").as("n"))
      .groupBy(col("lang")).agg(sum(col("n")).as("tokens"))
    val z = byLang.agg(round(sum(sqrt(col("tokens"))), 6).as("z"),
      sum(col("tokens")).as("budget"))
    val weight = round(sqrt(col("tokens")) / col("z"), 9)
    val target = round(weight * col("budget"), 3)
    val capped = round(least(target, col("tokens") * 1.2d), 3)
    byLang.crossJoin(broadcast(z))
      .select(col("lang"), col("tokens"), weight.as("weight"),
        target.as("target_tokens"), capped.as("capped_tokens"),
        round(capped / col("tokens"), 9).as("epochs"))
      .orderBy(col("lang"))
  }

  /** q252: DSIR-shaped importance resampling (Xie et al. 2023) —
    * select raw documents whose hashed-feature distribution looks like
    * a TARGET domain (here source src0 stands in for the curated
    * target corpus). Each document scores the mean per-token
    * log-likelihood ratio log(p_target(w)/p_raw(w)) under add-one-
    * smoothed unigram models, and the selection is the top 25 by
    * (score desc, doc_id) — the "sample raw data that matches the
    * target" primitive behind domain-targeted pretraining mixes.
    *
    * Scale shape: the two unigram models are vocabulary-sized count
    * tables built from one token-explode pass (gram-keyed shuffles,
    * the q203/q235 LM discipline — NEVER broadcast: at 100 TB the
    * vocabulary is large; the token stream left-joins them on word).
    * The three scalars (target mass, raw mass, vocab size) broadcast
    * as 1-row frames. Per-token ratios round to 9 then decimal-sum,
    * so scores are order-independent; the final top-25 is a
    * TakeOrdered, never a global sort. */
  def q252DsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"),
      explode(split(graft.functions.Cols.normText(col("text")), " "))
        .as("word"))
    val tokSrc = docs.select(col("doc_id"), col("source"),
      explode(split(graft.functions.Cols.normText(col("text")), " "))
        .as("word"))
    val tgt = tokSrc.filter(col("source") === "src0")
      .groupBy(col("word")).agg(count(lit(1)).as("ct"))
    val raw = tok.groupBy(col("word")).agg(count(lit(1)).as("cr"))
    val scTgt = tokSrc.filter(col("source") === "src0")
      .agg(count(lit(1)).as("nt"))
    val scRaw = tok.agg(count(lit(1)).as("nr"),
      count_distinct(col("word")).as("v"))
    val lr = round(log(
      ((coalesce(col("ct"), lit(0L)) + 1L).cast("double") *
        (col("nr") + col("v")).cast("double")) /
      ((col("cr") + 1L).cast("double") *
        (col("nt") + col("v")).cast("double"))), 9)
    val scored = tok
      .join(tgt, Seq("word"), "left")
      .join(raw, Seq("word"))
      .crossJoin(broadcast(scTgt)).crossJoin(broadcast(scRaw))
      .select(col("doc_id"), lr.cast("decimal(28,9)").as("lr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lr")).cast("double") /
          count(lit(1)).cast("double"), 9).as("dsir_score"))
    scored
      .join(docs.select(col("doc_id"), col("lang"), col("source")),
        "doc_id")
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(25)
  }

  /** q263: overlapping token-window chunking — the restructuring pass
    * that turns variable-length documents into fixed-context training
    * or retrieval units (window 64 tokens, stride 48, so consecutive
    * chunks share a 16-token overlap). The number of chunks is
    * `1 + ceil(max(0, n-64)/48)` — every document yields at least one
    * chunk and the last chunk always reaches the document's end, so
    * no token is dropped; `(doc_id, chunk_idx)` is the stable chunk
    * key that survives re-runs and re-partitioning.
    *
    * Scale shape: a pure per-row map + explode — NO shuffle at all
    * (the plan is scan → generate → project): a 100 TB corpus chunks
    * shard-locally with zero coordination, and the ~1.33× token
    * amplification from the overlap is paid in the output, never in
    * an exchange. All arithmetic is integer (no float `ceil`), so the
    * chunk grid is bitwise portable across engines. */
  def q263DocChunks(spark: SparkSession, dir: String): DataFrame =
    docChunks(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Unordered chunk grid over any (doc_id, text) frame — split out so
    * the deletion-propagation certificate (q279) can RE-DERIVE the
    * chunk artifact from the kept corpus and diff it against the
    * propagated one. */
  private[graft] def docChunks(documents: DataFrame): DataFrame = {
    val W = 64
    val S = 48
    documents
      .select(col("doc_id"),
        split(graft.functions.Cols.normText(col("text")), " ").as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("k", explode(sequence(lit(0L),
        expr(s"(greatest(n - $W, 0L) + ${S - 1}L) DIV ${S}L"))))
      .select(col("doc_id"), col("k").cast("int").as("chunk_idx"),
        (col("k") * S).cast("long").as("chunk_start"),
        least(lit(W.toLong), col("n") - col("k") * S).as("chunk_len"),
        array_join(slice(col("w"), (col("k") * S + 1).cast("int"),
          lit(W)), " ").as("chunk_text"))
  }
}
