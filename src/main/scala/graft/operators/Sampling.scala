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
  def split(key: Column): Column =
    when(hashOf(key) < "cc", "train")
      .when(hashOf(key) < "e6", "val")
      .otherwise("test")

  /** Dataset split audit: document counts per (split, lang) — the
    * sanity report run before any training job. */
  def q55HashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("split", split(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"), col("lang"))

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
}
