package graft

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.operators.Cleanse
import graft.sources.Ingest

/** The staged extract→transform→load pipeline (SURVEY.md §2A O27) —
  * the reference DAG (`/root/reference/dags/etl_csv_to_dwh.py:36`)
  * collapsed into one Spark driver: stage functions share a
  * SparkSession, hand off through filesystem zones (restartable, like
  * the reference's shared volume), and each stage runs under the same
  * retry budget the DAG declares (retries=1).
  */
object Pipeline {

  /** The DAG's retry semantics (`etl_csv_to_dwh.py:5-9`): n retries
    * after the first attempt, fixed delay between attempts. */
  def retry[T](retries: Int, delayMs: Long = 0)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        // NonFatal only: never retry through OOM/interrupt — a fatal
        // error means the JVM (or the caller's cancellation) wins
        case scala.util.control.NonFatal(_) if attempt < retries =>
          attempt += 1
          if (delayMs > 0) Thread.sleep(delayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** extract: newest CSV in the input zone, staged into processing
    * (O1+O2). None = nothing to do, matching the reference's no-op
    * message path. */
  def extract(inputDir: String, stagingDir: String): Option[Path] =
    Ingest.latestFile(inputDir).map(Ingest.stageCopy(_, stagingDir))

  /** transform: cleanse the staged CSV and write the clean parquet
    * zone (O3 → O4–O20 → O21). The cleanse defaults to the reference's
    * netflix-titles semantics; callers pass any DataFrame=>DataFrame
    * for other shapes. */
  def transform(spark: SparkSession, stagedCsv: Path, cleanDir: String,
      cleanse: DataFrame => DataFrame = Cleanse.cleanseTitles): Unit =
    cleanse(Ingest.readCsv(spark, stagedCsv.toString))
      .write.mode(SaveMode.Overwrite).parquet(cleanDir)

  /** load: clean parquet → CSV zone (O22+O23), with the S3A conf
    * applied first when credentials exist in the environment (O24/O26)
    * so the same code writes `s3a://` URIs on a real cluster. */
  def load(spark: SparkSession, cleanDir: String, outDir: String): Unit = {
    Ingest.s3CredentialsFromEnv().foreach { case (a, s) =>
      Ingest.configureS3A(spark,
        sys.env.getOrElse("S3_ENDPOINT", "s3.amazonaws.com"), a, s)
    }
    Ingest.writeCsv(spark.read.parquet(cleanDir), outDir, singleFile = true)
  }

  /** Run the full pipeline over directory zones. Returns true when a
    * file was processed, false when the input zone was empty. */
  def run(spark: SparkSession, inputDir: String, stagingDir: String,
      cleanDir: String, outDir: String, retries: Int = 1): Boolean =
    retry(retries) {
      extract(inputDir, stagingDir) match {
        case None => false
        case Some(staged) =>
          transform(spark, staged, cleanDir)
          load(spark, cleanDir, outDir)
          true
      }
    }

  def main(args: Array[String]): Unit = {
    val Array(inputDir, stagingDir, cleanDir, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val processed = run(spark, inputDir, stagingDir, cleanDir, outDir)
      println(if (processed) s"[pipeline] wrote $outDir"
              else "[pipeline] no input files; nothing to do")
    } finally spark.stop()
  }
}
