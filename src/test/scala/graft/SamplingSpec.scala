package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("hash split is a partition: every doc in exactly one split") {
    val rows = Sampling.q55HashSplit(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == 500)
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // ~80/10/10 within generous tolerance at n=500
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit("train") > 300 && bySplit("train") < 480)
  }

  test("split assignment is deterministic across evaluations") {
    val a = Sampling.q55HashSplit(spark, sf).collect().map(_.toSeq)
    val b = Sampling.q55HashSplit(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("stratified sample takes exactly k rows per stratum") {
    val perLang = Sampling.q56StratifiedSample(spark, sf).collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 20))
  }

  test("packing bins respect the token budget up to one-doc overflow") {
    val docs = Tables.documents(spark, sf)
      .select(size(split(graft.functions.Cols.normText(col("text")), " "))
        .cast("long").as("tokens"))
      .agg(max("tokens")).collect().head.getLong(0)
    val bins = Sampling.q57SequencePacking(spark, sf).collect()
    // a bin can only exceed 2048 by the doc that straddles its start
    bins.foreach { r =>
      assert(r.getAs[Long]("total_tokens") < 2048 + docs,
        s"bin ${r.getAs[Long]("bin")} overflows")
    }
    assert(bins.map(_.getAs[Long]("n_docs")).sum == 500)
  }

  test("native expressions reject wrong input types at analysis") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("i", "s")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.VectorExprs.vecDot(col("i"), col("i")))
        .collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.TextExprs.simhash64(col("s"))).collect()
    }
  }

  test("split-leakage audit accounts for every near-dup pair exactly " +
      "once and flags exactly the cross-split ones") {
    val rows = operators.Sampling.q158SplitLeakage(spark, sf).collect()
    val totalPairs = rows.map(_.getLong(2)).sum
    val nPairs = operators.Dedup
      .q25DedupMinhash(spark, sf).count()
    assert(totalPairs == nPairs)
    rows.foreach { r =>
      val expectLeaks =
        if (r.getString(0) == r.getString(1)) 0L else r.getLong(2)
      assert(r.getLong(3) == expectLeaks, r.toString)
    }
  }

  test("shuffle order ranks are a contiguous permutation computed " +
      "without a single-partition sort") {
    val df = operators.Sampling.q199ShuffleOrder(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(3000))
    assert(!plan.contains("SinglePartition"), plan.take(3000))
    val ranks = df.collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to ranks.length).toSeq)
  }

  test("shard manifest partitions the corpus and hash balance holds") {
    val rows = Sampling.q228ShardManifest(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "shards must partition the corpus exactly")
    // balance factors average to 1 by construction (16 shards)
    val balances = rows.map(_.getAs[Double]("balance"))
    assert(math.abs(balances.sum / 16.0 - 1.0) < 1e-9)
    // law-of-large-numbers bound, loose at sf0.001 (~60 docs/shard);
    // the factor tightens as corpus size grows — that's the point of
    // the manifest as a per-run certificate
    balances.foreach(b => assert(b > 0.3 && b < 2.0, s"balance=$b"))
  }

  test("mixture application flattens every language toward the " +
      "smallest language's token budget") {
    val rows = Sampling.q244MixtureApply(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.map(_.getAs[Long]("tokens_in")).min
    rows.foreach { r =>
      val (in, kept, rate) = (r.getAs[Long]("tokens_in"),
        r.getAs[Long]("tokens_kept"), r.getAs[Double]("rate"))
      assert(kept <= in)
      // the budget language itself passes through untouched
      if (in == budget) {
        assert(rate == 1.0)
        assert(kept == in)
      }
      // hash thinning lands near rate*mass; loose at sf0.001 where a
      // language is a few hundred docs (the q228 tolerance argument)
      assert(math.abs(kept.toDouble - rate * in) / in < 0.35,
        s"lang=${r.getString(0)} kept=$kept in=$in rate=$rate")
    }
  }

  test("temperature mixture: weights normalize, cap binds both ways") {
    val rows = operators.Sampling
      .q251TemperatureMixture(TestSpark.spark, TestSpark.sf).collect()
    assert(rows.length >= 2)
    // sqrt-temperature weights sum to 1 (Z rounded to 6 decimals, so
    // the sum is off by at most |langs| rounding ulps)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-5)
    rows.foreach { r =>
      val (t, target, capped, epochs) = (r.getAs[Long]("tokens"),
        r.getAs[Double]("target_tokens"), r.getAs[Double]("capped_tokens"),
        r.getAs[Double]("epochs"))
      assert(capped <= target + 1e-9)
      assert(epochs <= 1.2 + 1e-9) // the epoch cap is a hard ceiling
      assert(capped <= t * 1.2 + 1e-6)
    }
    // temperature flattening must leave the biggest language UNDER one
    // epoch and upweight at least one small language past one epoch
    val byTokens = rows.sortBy(-_.getAs[Long]("tokens"))
    assert(byTokens.head.getAs[Double]("epochs") < 1.0)
    assert(byTokens.last.getAs[Double]("epochs") > 1.0)
  }

  test("DSIR selection enriches toward the target domain") {
    val rows = Sampling.q252DsirSelect(spark, sf).collect()
    assert(rows.length == 25)
    // scores arrive ranked
    val scores = rows.map(_.getAs[Double]("dsir_score"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
    // the point of importance resampling: the target source's share of
    // the selection strictly exceeds its corpus share
    val srcShare = rows.count(_.getAs[String]("source") == "src0") / 25.0
    val docs = Tables.documents(spark, sf)
    val corpusShare = docs.filter(col("source") === "src0").count()
      .toDouble / docs.count()
    assert(srcShare > corpusShare,
      s"selection share $srcShare vs corpus share $corpusShare")
  }

  test("chunking loses no token, overlaps by 16, and never shuffles") {
    val chunks = Sampling.q263DocChunks(spark, sf)
    val rows = chunks.collect()
    // per-doc reconstruction: chunk k covers [48k, 48k+len); the union
    // of covered index ranges must be exactly [0, n)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(graft.functions.Cols.normText(col("text")), " "))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      val n = docs(id)
      // first chunk starts at 0; the last reaches the document's end
      assert(sorted.head.getAs[Long]("chunk_start") == 0L)
      val last = sorted.last
      assert(last.getAs[Long]("chunk_start") +
        last.getAs[Long]("chunk_len") == n)
      // consecutive chunks overlap by exactly window - stride = 16
      // tokens (unless the doc ends first)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("chunk_start") ==
            a.getAs[Long]("chunk_start") + 48L)
        case _ => ()
      }
      // no chunk exceeds the window
      assert(sorted.forall(_.getAs[Long]("chunk_len") <= 64L))
    }
    // the chunker is shard-local: no Exchange anywhere in the plan
    // (the orderBy is presentation-only; check the unordered frame)
    val plan = Sampling.q263DocChunks(spark, sf)
      .queryExecution.executedPlan.toString
    // the final orderBy adds one range exchange for presentation; the
    // chunk computation itself (scan -> generate -> project) must not
    assert(plan.split("Sort").head.indexOf("Exchange") == -1 ||
      plan.indexOf("Generate") < plan.indexOf("Exchange"),
      "chunk generation must happen before any exchange")
  }
}
