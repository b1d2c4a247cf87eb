package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc output-cardinality probe (test scope, not shipped): prints
  * the row count of the named catalog queries at a given sfDir. Used
  * to normalize stress-ratio readings for queries whose OUTPUT
  * relation legitimately grows superlinearly under ScaleUp's
  * verbatim-name replication (lev≤d name pairs grow ~R² in the
  * replica count — see the stress-epoch pin in BASELINE.md), so the
  * fair scale metric is time per output row, not wall-clock alone.
  *
  * Usage: sbt "Test/runMain graft.CountRows q230_fuzzy_join[,more] [sfDir]"
  */
object CountRows {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(s"[countrows] $name @ $sfDir: $n rows")
    }
    spark.stop()
  }
}
