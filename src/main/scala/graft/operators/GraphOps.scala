package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Semi-supervised graph analytics over the dedup tier's edge
  * relations. The connectivity family ([[Dedup.connectedComponents]],
  * `ccStarWithRounds`, q242 incremental CC) answers "which rows are
  * the same thing"; fixed-point PageRank (q150) answers "which nodes
  * matter"; this adds the remaining classic — "what CLASS is this
  * node, given a few labeled ones" — as weighted label propagation,
  * the graph-shaped cousin of the embedding tier's label-kNN (q254).
  *
  * Determinism contract (the repo's iterative discipline, q150/q248
  * precedent): scores are INTEGER evidence weights, so sums are
  * associative under any shuffle order, and the per-node argmax
  * tie-breaks on (score desc, label asc) — a total order. The oracle
  * replays the identical three synchronous rounds as unrolled SQL
  * CTEs.
  */
object GraphOps {

  private val LpRounds = 3

  /** Semi-supervised LABEL PROPAGATION over the near-duplicate graph:
    * one document in five arrives labeled (its `lang`); labels spread
    * along the exact n-gram-Jaccard relation (q68's edges — df-capped
    * inverted-index candidates, ≥ 0.6 verified) for three synchronous
    * rounds. Per round every non-seed node takes the label with the
    * highest integer evidence among its labeled neighbors — evidence
    * is the shared-shingle count |A∩B| (an exact int) — and keeps its
    * previous label when no neighbor is labeled. Seeds are pinned.
    *
    * This is the curation move for cheap metadata BACKFILL: language /
    * topic / license tags cover a sliver of a crawl, and near-dup
    * structure extends them without training a model. Scale shape:
    * the edge list is the same df-capped candidate relation the dedup
    * tier already bounds (built once, `localCheckpoint`ed, reused by
    * every round); each round is one join onto labeled nodes + one
    * integer argmax — two shuffles, no per-round growth, lineage
    * truncated per round like [[Dedup.connectedComponents]]. Three
    * rounds reach anything within three hops of a seed; production
    * tunes rounds to label COVERAGE, not convergence (GraphSpec
    * asserts coverage is monotone in rounds and seeds stay pinned). */
  def q311LabelProp(spark: SparkSession, dir: String): DataFrame =
    labelPropagate(spark, dir, LpRounds)

  /** The propagation engine behind q311, with the round count exposed
    * so GraphSpec can assert coverage is monotone in rounds. */
  private[graft] def labelPropagate(spark: SparkSession, dir: String,
      rounds: Int): DataFrame = {
    // checkpointed like edges/lab: docs feeds two joins per round plus
    // the final projection — without this the documents scan re-runs
    // ~2·rounds+2 times
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .localCheckpoint()
    val sh = Dedup.shingled(Tables.documents(spark, dir))
    val scored = Dedup.invertedIndexCandidates(sh, dfCap = 20)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("w"),
        graft.functions.TextExprs.jaccard(col("sh_a"), col("sh_b"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("w"))
    val edges = scored
      .union(scored.select(col("doc_b"), col("doc_a"), col("w"))
        .toDF("doc_a", "doc_b", "w"))
      .localCheckpoint()
    val isSeed = col("doc_id") % 5 === 0
    var lab = docs
      .select(col("doc_id"), when(isSeed, col("lang")).as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val wBest = Window.partitionBy(col("doc_a"))
        .orderBy(col("s").desc, col("nl").asc)
      val best = edges
        .join(lab.filter(col("label").isNotNull)
            .select(col("doc_id").as("doc_b"), col("label").as("nl")),
          "doc_b")
        .groupBy(col("doc_a"), col("nl"))
        .agg(sum(col("w")).as("s"))
        .withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("doc_a").as("doc_id"), col("nl").as("best"))
      lab = docs.join(best, Seq("doc_id"), "left")
        .join(lab.select(col("doc_id"), col("label").as("prev")),
          Seq("doc_id"))
        .select(col("doc_id"),
          when(isSeed, col("lang"))
            .otherwise(coalesce(col("best"), col("prev"))).as("label"))
        .localCheckpoint()
    }
    docs.join(lab, Seq("doc_id"))
      .select(col("doc_id"), col("label"),
        when(isSeed, "seed")
          .when(col("label").isNotNull, "prop")
          .otherwise("none").as("origin"))
      .orderBy(col("doc_id"))
  }
}
