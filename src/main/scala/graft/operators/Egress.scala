package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._
import graft.sources.Ingest

/** Source/sink operators as verified catalog queries: the CSV
  * ingest/egress cycle and the session-catalog table — the pieces of
  * the reference's extract/load surface that a unit test alone can't
  * witness through the driver's correctness gate.
  */
object Egress {

  private def tmpDir(name: String): String =
    s"${sys.props("user.dir")}/target/tmp/$name"

  /** The full file cycle, oracle-verified by read-back: parquet →
    * CSV sink (O23, header+delimiter) → latest-file pick (O1) →
    * staging copy (O2) → CSV scan with schema inference (O3) →
    * aggregate. The aggregation over the round-tripped data must
    * hash-match the oracle computed on the ORIGINAL parquet — any
    * quoting/typing/row-alignment corruption in the cycle fails the
    * gate. Temp zones live under target/tmp (driver-local by design;
    * the same writer targets s3a:// URIs at scale). */
  def q41CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val csvZone = tmpDir("q41_csv_zone")
    val staging = tmpDir("q41_staging")
    Ingest.writeCsv(Tables.customer(spark, dir), csvZone, singleFile = true)
    val latest = Ingest.latestFile(csvZone, "part-*.csv")
      .getOrElse(sys.error(s"no CSV produced in $csvZone"))
    val staged = Ingest.stageCopy(latest, staging)
    Ingest.readCsv(spark, staged.toString)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Latest-wins upsert (SCD-1 compaction): one surviving row per key,
    * the one with the greatest (ts, event_id) — how a CDC feed or
    * re-delivered batch collapses to current state. Window row_number
    * per key; WindowGroupLimit keeps 1 row/key map-side, so the
    * shuffle carries keys, not history. */
  def q58LatestWins(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** JSON-lines source: documents written as jsonl, read back with an
    * explicit schema (inference over JSON is a full extra pass), and
    * aggregated — oracle runs on the original parquet, so any
    * serialization drift in the cycle fails the hash. */
  def q59JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val zone = tmpDir("q59_json_zone")
    Tables.documents(spark, dir).write.mode(SaveMode.Overwrite).json(zone)
    spark.read.schema(Tables.documents(spark, dir).schema).json(zone)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  /** ORC sink/source round-trip — the other columnar format the
    * engine writes; verified the same way. */
  def q60OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val zone = tmpDir("q60_orc_zone")
    Tables.orders(spark, dir).write.mode(SaveMode.Overwrite).orc(zone)
    spark.read.orc(zone)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** Session-catalog table (the Glue-catalog role, SURVEY.md §1
    * "Downstream schema"): persist nation via saveAsTable, then query
    * it back through the catalog by name. The managed table lands in
    * the warehouse dir as parquet; on a cluster the same call targets
    * the shared metastore. */
  def q42CatalogTable(spark: SparkSession, dir: String): DataFrame = {
    // the in-memory catalog forgets tables between sessions but the
    // warehouse directory persists — clear both before (re)creating
    Scale.dropManaged(spark, "graft_nation_catalog")
    Tables.nation(spark, dir).write.mode(SaveMode.Overwrite)
      .saveAsTable("graft_nation_catalog")
    spark.table("graft_nation_catalog")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_nation"))
      .orderBy(col("n_regionkey"))
  }
}
