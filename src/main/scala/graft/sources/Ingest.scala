package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest/egress surface — the reference's extract/load stages as
  * first-class operators (SURVEY.md §2A O1–O3, O21–O26).
  *
  * File staging (O1/O2) is driver-side by design: picking ONE newest
  * file and copying it is inherently a coordinator decision, exactly as
  * in the reference (`/root/reference/etl/extract.py:7-25`). At scale
  * the same pick feeds `spark.read` directly (no copy needed —
  * `pathGlobFilter`/`modifiedAfter` push listing into the source), so
  * nothing here ever moves row data through the driver.
  */
object Ingest {

  /** O1: newest CSV in a directory = lexicographically last matching
    * file, the reference's `sorted(files)[-1]` semantics
    * (`etl/extract.py:17`). None when the directory has no match. */
  def latestFile(dir: String, glob: String = "*.csv"): Option[Path] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) None
    else {
      val stream = Files.newDirectoryStream(d, glob)
      try stream.asScala.toSeq.sortBy(_.getFileName.toString).lastOption
      finally stream.close()
    }
  }

  /** O2: idempotent staging copy into the processed dir
    * (`etl/extract.py:19-23`). Returns the staged path. */
  def stageCopy(src: Path, dstDir: String): Path = {
    val d = Paths.get(dstDir)
    Files.createDirectories(d)
    val dst = d.resolve(src.getFileName)
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    dst
  }

  /** O3: CSV scan with header; explicit schema when provided (the
    * deterministic path — SURVEY.md §7 risk 2), otherwise full-file
    * inference like the reference (`etl/transform.py:22`). */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  /** Robust CSV scan for dirty feeds: PERMISSIVE mode nulls
    * unparseable fields and captures the raw line in `_corrupt`
    * instead of failing the job — the at-scale ingest posture (one bad
    * row among billions must not kill the pipeline; quarantine it for
    * repair, like the reference's repair filter O20 does post-hoc). */
  def readCsvPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema.add("_corrupt", "string"))
      .csv(path)

  /** O23: CSV sink with header + delimiter (`etl/load.py:80-84`).
    * `singleFile` coalesces to one task for reference parity (one CSV
    * out); leave it false at scale so every partition writes. */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ",",
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("delimiter", delimiter)
      .csv(path)
  }

  /** O24: S3A connector configuration on the live Hadoop conf — the
    * builder-side surface of `etl/load.py:40-60`. No network in the
    * sandbox; this is the config plumbing, unit-tested as such. Modern
    * Hadoop parses duration suffixes natively, so the reference's
    * millisecond-patch loop (O25, `etl/load.py:14-36`) is obsolete. */
  def configureS3A(spark: SparkSession, endpoint: String,
      accessKey: String, secretKey: String): Unit = {
    val h = spark.sparkContext.hadoopConfiguration
    h.set("fs.s3a.endpoint", endpoint)
    h.set("fs.s3a.access.key", accessKey)
    h.set("fs.s3a.secret.key", secretKey)
    h.set("fs.s3a.aws.credentials.provider",
      "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
    h.set("fs.s3a.path.style.access", "true")
  }

  /** O26: credentials from the environment (`etl/load.py:9-11`) —
    * never hardcoded. */
  def s3CredentialsFromEnv(
      env: Map[String, String] = sys.env): Option[(String, String)] =
    for {
      a <- env.get("ACCESS_KEY")
      s <- env.get("SECRET_ACCESS_KEY")
    } yield (a, s)

  /** JDBC scan. The reference DECLARES a relational DWH leg ("CSV ->
    * Spark -> MySQL", `dags/etl_csv_to_dwh.py:13`) and installs the
    * connector (`Dockerfile.airflow:46`) but ships no JDBC code —
    * this closes that declared edge with Spark's own JDBC source
    * (tested offline against embedded Derby; the same call takes any
    * `jdbc:` URL + driver jar). `rangePartition` = (column, lower,
    * upper, n) splits the read into n range-parallel cursors —
    * mandatory at scale, where a single JDBC connection caps the scan
    * at one machine's link; without it the read is one partition. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      rangePartition: Option[(String, Long, Long, Int)] = None)
      : DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    rangePartition match {
      case Some((c, lo, hi, n)) => base
        .option("partitionColumn", c)
        .option("lowerBound", lo)
        .option("upperBound", hi)
        .option("numPartitions", n)
        .load()
      case None => base.load()
    }
  }

  /** JDBC sink: every partition opens its own connection and writes
    * batched inserts (`batchsize` bounds round-trips). Overwrite
    * drops/recreates the table — the reference DAG's declared
    * replace-load semantics. Dimension-sized results only; a 100 TB
    * fact table goes to parquet/object storage, not a row store. */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Overwrite, batchSize: Int = 1000): Unit =
    df.write.mode(mode).format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize).save()
}
