package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the sub-stages of exactJaccardPairs (q289). */
object ProbeJac {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val m = graft.operators.Dedup.getClass.getDeclaredMethods
      .find(_.getName == "shingled").get
    m.setAccessible(true)
    val docs = m.invoke(graft.operators.Dedup,
      Tables.documents(spark, sfDir))
      .asInstanceOf[org.apache.spark.sql.DataFrame]

    time("warmup shingled count")(println("  n=" + docs.count()))
    val dfTab = docs.select(explode(col("sh")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
    time("dfTab")(println("  n=" + dfTab.count()))
    val prefix = docs
      .select(col("doc_id"), size(col("sh")).as("n"),
        explode(col("sh")).as("s"))
      .join(dfTab, "s")
      .groupBy(col("doc_id"), col("n"))
      .agg(array_sort(collect_list(struct(col("df"), col("s"))))
        .as("ord"))
      .select(col("doc_id"), col("n"),
        posexplode(expr("slice(ord, 1, n - ((4 * n + 4) div 5) + 1)")))
      .select(col("doc_id"), col("n"), (col("pos") + 1).as("pos"),
        col("col.s").as("s"))
    val prefixC = prefix.localCheckpoint()
    time("prefix build+ckpt")(println("  n=" + prefixC.count()))
    val cand0 = prefixC.as("a")
      .join(prefixC.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * 5 >= col("a.n") * 4 &&
          col("a.n") * 5 >= col("b.n") * 4 &&
          (lit(1) + least(col("a.n") - col("a.pos"),
            col("b.n") - col("b.pos"))) * 9 >=
            (col("a.n") + col("b.n")) * 4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("cand pre-distinct")(println("  n=" + cand0.count()))
    val cand = cand0.distinct().localCheckpoint()
    time("cand distinct+ckpt")(println("  n=" + cand.count()))
    val verify = cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(graft.functions.TextExprs.jaccard(col("sh_a"), col("sh_b")),
          9).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    time("verify")(println("  n=" + verify.count()))
    time("full q289 noop")(
      SparkEntry.queries("q289_prefix_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
