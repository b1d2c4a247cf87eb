package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cleanse, TopKAgg}

/** Property tests (SURVEY.md §5 item 1): the country parser against a
  * reference model, text normalization laws, and the top-k aggregator
  * against sort-take — randomized inputs (fixed seed for repeatable
  * CI), deterministic laws. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  /** Reference model of the cleanse country rule (the semantics of
    * /root/reference/etl/transform.py:73-83, independently coded). */
  private def modelCountry(s: String): Option[String] =
    Option(s).flatMap { raw =>
      raw.replace("\"", "").split(",", -1).iterator
        .map(_.trim).filter(_.nonEmpty)
        .flatMap(Cleanse.EuropeStd.get)
        .take(1).toSeq.headOption
    }

  private val countryGen: Gen[String] = {
    val names = Gen.oneOf(Cleanse.EuropeStd.keys.toSeq ++
      Seq("Peru", "Chile", "Japan", "", " ", "USA"))
    val decorated = names.flatMap(n => Gen.oneOf(n, s" $n ", s""""$n""""))
    Gen.choose(0, 4).flatMap(k =>
      Gen.listOfN(k, decorated).map(_.mkString(",")))
  }

  test("europeCountry matches the reference model on random inputs") {
    import spark.implicits._
    val samples = Gen.listOfN(300, countryGen)
      .pureApply(Gen.Parameters.default, Seed(7L))
    val got = samples.toDF("in")
      .select(Cleanse.europeCountry(org.apache.spark.sql.functions.col("in")))
      .collect().map(r => Option(r.getString(0)))
    samples.zip(got).foreach { case (in, out) =>
      assert(out == modelCountry(in), s"input <$in>")
    }
  }

  test("normText is idempotent and whitespace-insensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOf(Gen.oneOf("Word", "x", "  ", "\t", "Aa"))
      .map(_.mkString(" "))
    val samples = Gen.listOfN(200, gen)
      .pureApply(Gen.Parameters.default, Seed(11L))
    val df = samples.toDF("t").select(
      graft.functions.Cols.normText(col("t")).as("n1"))
      .select(col("n1"),
        graft.functions.Cols.normText(col("n1")).as("n2"))
    assert(df.filter(col("n1") =!= col("n2")).count() == 0)
  }

  test("globalIndex assigns contiguous 1..n ranks in sort order on " +
      "random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      v <- Gen.chooseNum(-1000, 1000)
      id <- Gen.chooseNum(0L, 100000L)
    } yield (id, v)
    (0 until 3).foreach { i =>
      val rows = Gen.listOfN(500, gen)
        .pureApply(Gen.Parameters.default, Seed(5L + i))
        .distinctBy(_._1) // unique tie-break key
      val df = rows.toDF("id", "v").repartition(7)
      val got = operators.Scale.globalIndex(df,
        col("v").desc, col("id").asc)
        .select("id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val expected = rows.sortBy { case (id, v) => (-v, id) }
        .zipWithIndex.map { case ((id, _), ix) => (id, ix + 1L) }
      assert(got.sortBy(_._2).toSeq == expected.toSeq, s"case $i")
    }
  }

  test("TopKAgg equals sort-take for any input order and any split") {
    val hitGen = for {
      cos <- Gen.oneOf(-1.0, -0.5, 0.0, 0.3, 0.3, 0.9, 1.0) // force ties
      id <- Gen.chooseNum(0L, 50L)
    } yield (1L, id, cos)
    val caseGen = for {
      ins <- Gen.listOf(hitGen)
      k <- Gen.chooseNum(1, 8)
    } yield (ins, k)
    (0 until 200).foreach { i =>
      val (ins, k) = caseGen.pureApply(
        Gen.Parameters.default, Seed(42L + i))
      val agg = TopKAgg.topK(k)
      val expected = ins.map(h => (h._3, h._2))
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(k)
      val direct = agg.finish(ins.foldLeft(agg.zero)(agg.reduce))
      assert(direct == expected, s"case $i direct")
      val (l, r) = ins.splitAt(ins.length / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      assert(merged == expected, s"case $i merged")
    }
  }
}
