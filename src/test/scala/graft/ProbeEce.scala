package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeEce {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = graft.operators.TextStats.getClass.getDeclaredMethods
      .find(_.getName == "hashedScores").get
    m.setAccessible(true)
    val s = m.invoke(graft.operators.TextStats, spark,
      "/root/testdata/sf0.001")
      .asInstanceOf[org.apache.spark.sql.DataFrame]
      .select(col("doc_id"), col("lang"), col("score"))
    val mm = s.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    val p = s.crossJoin(broadcast(mm))
      .select(col("lang"),
        round((col("score") - col("lo")) / (col("hi") - col("lo")), 9)
          .as("p"))
    val bins = p
      .withColumn("bin",
        least(floor(col("p") * 10), lit(9.0d)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("p").cast("decimal(28,9)")).cast("double") /
          count(lit(1)).cast("double"), 9).as("avg_p"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_pos"))
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n").cast("double"), 9))
      .withColumn("gap", round(abs(col("avg_p") - col("pos_rate")), 9))
    bins.orderBy("bin").collect().foreach(r => println("BIN " + r))
    val numDen = bins.agg(
      sum(col("gap").cast("decimal(28,9)") * col("n")).as("num"),
      sum(col("n")).as("den")).collect().head
    println("NUM " + numDen.get(0) + " DEN " + numDen.get(1))
    val ece = bins.agg(
      round(sum(col("gap").cast("decimal(28,9)") * col("n")).cast("double")
        / sum(col("n")).cast("double"), 9).as("ece")).collect().head
    println("ECE " + ece.get(0))
    spark.stop()
  }
}
