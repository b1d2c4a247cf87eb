package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Writes each catalog query to the `noop`
  * sink so the FULL plan executes (a bare `.count()` would let Catalyst
  * prune projections and report optimistic times). Prints one JSON line
  * for the driver's BENCH_r{N}.json.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb JVM/codegen/FS-cache startup so the first
    // timed query isn't charged ~4s of session warmup
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case scala.util.control.NonFatal(_) => () }
    // NonFatal only: an OOM/LinkageError must crash the run (rc != 0),
    // not masquerade as a slow query. A failed query reports -1 and
    // lands in "failed" so it can't pass as a fast success.
    //
    // Median-of-3 per query: a single-run time charges whatever the
    // PREVIOUS query left behind (stream-drain cleanup, GC, cold code
    // cache) to an innocent neighbor — the r3 record shows q13_rollup
    // at 10.75s right after three streaming queries vs 0.64s for its
    // cube twin. Run 1 absorbs that residue, the median discards it;
    // all three raw samples land in bench_full.json for auditing.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val runs = Seq(once(), once(), once())
        (name, runs.sorted.apply(1), true, runs)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        (name, -1.0, false, Nil)
      }
    }
    // 3-decimal per-query times keep the line short, and the headline
    // total/failed keys go LAST: the driver keeps only the final ~2000
    // chars of output, so a long catalog must not push the total out of
    // the capture window. A full copy also lands in bench_full.json.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _) => v }.sum
    // longitudinal anchor: the round-1 catalog (q1–q20) as a stable
    // subtotal, comparable across rounds regardless of catalog growth
    val core20 = results.collect {
      case (k, v, true, _) if k.stripPrefix("q").takeWhile(_.isDigit)
        .toIntOption.exists(_ <= 20) => v
    }.sum
    val line =
      s"""{"queries":$qs,"sf":"$sfDir","failed":$failed,"metric":"total","unit":"sec","n_queries":${results.size},"core20_sec":${f3(core20)},"value":${f3(total)}}"""
    println(line)
    // the committed full record: the one-line summary (medians) plus
    // every raw sample, so round-over-round comparisons can audit the
    // measurement itself, not just the headline
    val raw = results.map { case (k, _, _, runs) =>
      s"\"" + k + "\":" + runs.map(f3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"),
      line + "\n" + s"""{"runs_per_query":3,"stat":"median","raw":$raw}""" + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
