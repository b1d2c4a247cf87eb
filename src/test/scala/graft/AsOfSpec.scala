package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)

  test("asofJoin picks the latest right ts at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "a"), // before any right: null
      (1L, ts(20), "b"), // exactly at right 20: takes 20
      (1L, ts(35), "c"), // between 20 and 40: takes 20
      (1L, ts(45), "d"), // after 40: takes 40
      (2L, ts(100), "e") // other key, no right rows: null
    ).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(20)), (1L, ts(40))).toDF("user_id", "ts")
    val got = AsOf.asofJoin(left, right, "user_id", "ts")
      .orderBy("user_id", "ts")
      .collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime)))
    assert(got.toSeq == Seq(
      ("a", None),
      ("b", Some(ts(20).getTime)),
      ("c", Some(ts(20).getTime)),
      ("d", Some(ts(40).getTime)),
      ("e", None)))
  }

  test("asofJoin accepts a differently-named right timestamp column") {
    import spark.implicits._
    val left = Seq((1L, ts(35), "c"), (1L, ts(10), "a"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(20))).toDF("user_id", "observed_at")
    val got = AsOf.asofJoin(left, right, "user_id", "ts",
      tsRight = "observed_at")
      .orderBy("ts").collect()
      .map(r => Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime))
    assert(got.toSeq == Seq(None, Some(ts(20).getTime)))
  }

  test("asof lag is never negative and signups match themselves") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup").select(col("user_id"), col("ts"))
    val joined = AsOf.asofJoin(events, signups, "user_id", "ts")
    assert(joined.filter(col("asof_ts") > col("ts")).count() == 0)
    // every signup event has itself as the as-of match (lag 0 or a
    // later same-user signup cannot exist before it)
    assert(joined.filter(col("event_type") === "signup" &&
      col("asof_ts").isNull).count() == 0)
  }

  test("range join classifies every event into exactly one band") {
    import org.apache.spark.sql.functions._
    val total = AsOf.q52RangeJoin(spark, sf)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("range join plans an equi-join, not a nested loop") {
    val plan = AsOf.q52RangeJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("NestedLoop"), plan.take(2000))
  }

  test("native as-of join matches the composed union+window formulation") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(35), "c"),
      (1L, ts(45), "d"), (2L, ts(100), "e"))
      .toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts(20)), (1L, ts(40)), (4L, ts(1)))
      .toDF("user_id", "ts")
    import org.apache.spark.sql.functions.col
    val native = plans.NativeAsOf.asofJoin(left, right, "user_id", "ts")
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime))).toSeq
    val composed = AsOf.asofJoin(left, right, "user_id", "ts")
      .orderBy("user_id", "ts").collect()
      .map(r => (r.getAs[String]("tag"),
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime))).toSeq
    assert(native == composed)
    assert(native == Seq(
      ("a", None), ("b", Some(ts(20).getTime)), ("c", Some(ts(20).getTime)),
      ("d", Some(ts(40).getTime)), ("e", None)))
  }

  test("native as-of plans AsOfJoinExec and agrees on testdata") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"))
    val df = plans.NativeAsOf.asofJoin(events, signups, "user_id", "ts")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys.take(2000))
    // each side shuffles independently on its own key — two exchanges
    assert("Exchange hashpartitioning".r.findAllIn(phys).length == 2,
      phys.take(2000))
    val native = df
      .groupBy(col("user_id")).agg(count(col("asof_ts")).as("n"))
      .orderBy(col("user_id")).collect().toSeq
    val composed = AsOf.asofJoin(events, signups, "user_id", "ts")
      .groupBy(col("user_id")).agg(count(col("asof_ts")).as("n"))
      .orderBy(col("user_id")).collect().toSeq
    assert(native == composed)
  }
}
