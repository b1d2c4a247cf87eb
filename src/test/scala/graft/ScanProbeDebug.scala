package graft
import org.apache.spark.sql.SparkSession
object ScanProbeDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.SqlDml.ensureCatalog(spark)
    val root = graft.operators.SqlDml.tableRoot("orders_scanprobe")
    val segDirs = Seq("c0","c1","c2").map(c => graft.sources.RloMeta.commitDir(root, c).toString)
    spark.read.parquet(segDirs: _*).createOrReplaceTempView("native_t")
    val q = "SELECT SUM(o_orderkey) AS k FROM %T"
    def split(label: String, table: String): Unit = {
      (1 to 7).foreach { i =>
        val t0 = System.nanoTime()
        val df = spark.sql(q.replace("%T", table))
        val plan = df.queryExecution.executedPlan // force planning
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        if (i >= 5) println(f"$label plan=${(t1-t0)/1e6}%.1fms exec=${(t2-t1)/1e6}%.1fms")
      }
    }
    split("NATIVE", "native_t")
    split("CONN  ", "graft_rlo.db.orders_scanprobe")
  }
}
