package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query micro-bench (test scope, not shipped): times the
  * named catalog queries in isolation, 3 runs each, median reported —
  * the tool for chasing a single bench outlier without a full
  * `graft.Bench` sweep.
  *
  * Usage: sbt "Test/runMain graft.QueryBench q51_asof_join,q76_asof_native [sfDir]"
  */
object QueryBench {
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
      // same stress-sweep knob as graft.Bench so single-query probes
      // of ScaleUp data run under the pinned protocol's split size
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name: ${ts.map(t => f"$t%.2f").mkString(" ")}" +
        f"  median ${ts.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
