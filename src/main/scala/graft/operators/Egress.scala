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

  /** Session-catalog table (the Glue-catalog role, SURVEY.md §1
    * "Downstream schema"): persist nation via saveAsTable, then query
    * it back through the catalog by name. The managed table lands in
    * the warehouse dir as parquet; on a cluster the same call targets
    * the shared metastore. */
  def q42CatalogTable(spark: SparkSession, dir: String): DataFrame = {
    // the in-memory catalog forgets tables between sessions but the
    // warehouse directory persists — clear both before (re)creating
    spark.sql("DROP TABLE IF EXISTS graft_nation_catalog")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, "graft_nation_catalog")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    Tables.nation(spark, dir).write.mode(SaveMode.Overwrite)
      .saveAsTable("graft_nation_catalog")
    spark.table("graft_nation_catalog")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_nation"))
      .orderBy(col("n_regionkey"))
  }
}
