package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextStats

class TextStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("text stats cover every (lang, source) with positive counts") {
    val rows = TextStats.q31TextStats(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Double]("avg_tokens") > 0)
    }
  }

  test("lang-id confusion matrix partitions the corpus") {
    val total = TextStats.q32LangId(spark, sf).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(total == 500)
  }

  test("quality ratios are in [0, 1] and buckets are exhaustive") {
    val rows = TextStats.q33QualityScore(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val sw = r.getAs[Double]("stopword_ratio")
      val dg = r.getAs[Double]("digit_ratio")
      assert(sw >= 0 && sw <= 1)
      assert(dg >= 0 && dg <= 1)
      assert(Set("high", "medium", "low")(r.getAs[String]("quality")))
    }
  }

  test("BPE-ish tokens are at least as many as whitespace tokens") {
    TextStats.q34TokenCount(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("total_bpe") >= r.getAs[Long]("total_ws"))
      assert(r.getAs[Long]("vocab") > 0)
    }
  }

  test("doc fingerprints are 32-hex and shingle counts positive") {
    val rows = TextStats.q35DocFingerprint(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[String]("fp").matches("[0-9a-f]{32}"))
      assert(r.getAs[Int]("n_shingles") > 0)
    }
  }

  test("bigram LM scores every held-out doc with positive nll and " +
      "covers exactly the held-out split") {
    val rows = TextStats.q203BigramPpl(spark, sf).collect()
    assert(rows.nonEmpty)
    val heldOut = graft.Tables.documents(spark, sf)
      .filter("doc_id % 10 = 0 and size(split(trim(regexp_replace(" +
        "lower(text), '\\\\s+', ' ')), ' ')) >= 2")
      .count()
    assert(rows.length.toLong == heldOut)
    rows.foreach { r =>
      // add-one smoothing keeps every probability strictly < 1 on a
      // train vocabulary larger than any single count → nll > 0
      assert(r.getAs[Double]("mean_nll") > 0, r.toString)
      assert(r.getAs[Long]("n_bigrams") >= 1, r.toString)
    }
  }

  test("sparse tf-idf cosine stays in [threshold, 1], is banded, and " +
      "finds the near-dup pairs jaccard finds") {
    val df = TextStats.q201SparseCosine(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // candidate generation must go through the rare-term equi-join —
    // never an all-pairs shape. The one nested-loop join in the query
    // is the broadcast of the 1-row corpus-count aggregate into the
    // idf (the q70 pattern); it sits below the weighted-term
    // checkpoint, so it may appear at most once.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      plan.take(3000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.5 && c <= 1.0 + 1e-9, r.toString)
    }
    // shingle-Jaccard near-dups share weighted vocabulary too: every
    // q68 pair (threshold 0.6) must surface here — tf-idf cosine is
    // the weaker-or-equal filter on this corpus
    val cos = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = operators.Dedup.q68NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.subsetOf(cos),
      s"jaccard pairs missing from sparse cosine: ${jac -- cos}")
  }
}
