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

  test("kappa agreement re-derives exactly from the q32 confusion " +
      "matrix and stays in range") {
    val conf = TextStats.q32LangId(spark, sf).collect()
    val n = conf.map(_.getAs[Long]("n_docs")).sum
    val agree = conf
      .filter(r => r.getAs[String]("lang") == r.getAs[String]("predicted"))
      .map(_.getAs[Long]("n_docs")).sum
    val row = TextStats.q222KappaAgreement(spark, sf).collect() match {
      case Array(only) => only
      case other => fail(s"expected 1 row, got ${other.length}")
    }
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("n_agree") == agree)
    assert(row.getAs[Double]("po") == agree.toDouble / n)
    val kappa = row.getAs[Double]("kappa")
    assert(kappa >= -1.0 && kappa <= 1.0, s"kappa=$kappa")
    // chance-corrected score never exceeds raw agreement
    assert(kappa <= row.getAs[Double]("po") + 1e-12)
  }

  test("chi-squared cells are marginal-consistent and terms nonnegative") {
    val rows = operators.Quality.q221Chi2Independence(spark, sf).collect()
    assert(rows.nonEmpty)
    val grand = rows.map(_.getAs[Long]("observed")).sum
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, cells) =>
      val rt = cells.head.getAs[Long]("row_total")
      assert(cells.map(_.getAs[Long]("observed")).sum == rt,
        s"row marginal mismatch for lang=$lang")
    }
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, cells) =>
      val ct = cells.head.getAs[Long]("col_total")
      assert(cells.map(_.getAs[Long]("observed")).sum == ct,
        s"col marginal mismatch for source=$src")
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2_term") >= 0.0)
      assert(r.getAs[Double]("expected") > 0.0)
    }
    // the independence model puts expected mass on EVERY (row, col)
    // combination; the report only materializes observed cells, so
    // their expected sum is at most the grand total (equal only when
    // the table is dense)
    val expSum = rows.map(_.getAs[Double]("expected")).sum
    assert(expSum <= grand + 1e-6 * grand, s"expSum=$expSum grand=$grand")
    assert(expSum > 0.9 * grand,
      "observed support should carry most of the expected mass")
  }

  test("pii redaction leaves zero residual matches and redacts " +
      "exactly the injected docs") {
    val rows = operators.Quality.q227PiiRedaction(spark, sf).collect()
    assert(rows.nonEmpty)
    // the redaction's acceptance test: re-scanning the redacted text
    // finds nothing
    assert(rows.map(_.getAs[Long]("residual_pii")).sum == 0L)
    // the synthetic corpus carries no natural PII, so the redacted-doc
    // count equals the injected population (doc_id % 7 == 0)
    val injected = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0)
      .count()
    assert(rows.map(_.getAs[Long]("docs_redacted")).sum == injected)
    // each injected doc contributes exactly one email and one phone
    assert(rows.map(_.getAs[Long]("emails_redacted")).sum == injected)
    assert(rows.map(_.getAs[Long]("phones_redacted")).sum == injected)
  }

  test("bpe merge rounds produce non-increasing pair counts and " +
      "non-empty merged symbols") {
    val rows = operators.TextStats.q243BpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.length == 3)
    // a merge can only reduce existing pair counts, and every new pair
    // it creates is bounded by a pre-merge count — so the argmax count
    // never increases round over round
    assert(rows.sliding(2).forall { case Array(a, b) => b._4 <= a._4 })
    rows.foreach { case (_, l, r, n) =>
      assert(l.nonEmpty && r.nonEmpty && n > 0)
    }
  }

  test("Heaps curve is monotone, sub-linear, and beta sits in the " +
      "natural-corpus band") {
    val rows = TextStats.q261HeapsLaw(spark, sf).collect()
    assert(rows.length == 10)
    val grams = rows.map(_.getAs[Long]("n_grams_cum"))
    val types = rows.map(_.getAs[Long]("types_cum"))
    assert(grams.sliding(2).forall { case Array(a, b) => b > a })
    assert(types.sliding(2).forall { case Array(a, b) => b >= a })
    // types can never outnumber gram occurrences
    rows.foreach(r => assert(r.getAs[Long]("types_cum") <=
      r.getAs[Long]("n_grams_cum")))
    val beta = rows.head.getAs[Double]("beta")
    assert(rows.forall(_.getAs[Double]("beta") == beta))
    // sub-linear growth: repeated content exists, but vocabulary is
    // not saturated either
    assert(beta > 0.2 && beta < 1.0, s"beta=$beta")
  }

  test("score-drift KS is a valid statistic: in [0,1], grid-bounded, " +
      "and zero only if a source tracks the pool exactly") {
    val rows = operators.Quality.q262ScoreDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0)
      val j = r.getAs[Int]("worst_j")
      assert(j >= 1 && j <= 19)
    }
    // sources differ from the pool on this corpus — at least one
    // detaches visibly
    assert(rows.map(_.getAs[Double]("ks")).max > 0.05)
  }

  test("source-gate matrix partitions the corpus and its PII column " +
      "matches the injected population") {
    val rows = operators.Quality.q258SourceGates(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val injected = docs
      .filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0)
      .count()
    assert(rows.map(_.getAs[Long]("n_pii")).sum == injected)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      Seq("n_len_ok", "n_digit_ok", "n_wl_ok", "n_pii", "n_pass")
        .foreach(c => assert(r.getAs[Long](c) <= n, c))
      // survivors can't exceed any single gate's pass count
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_len_ok"))
      assert(r.getAs[Long]("n_pass") <= n - r.getAs[Long]("n_pii"))
    }
  }

  test("calibration report: bins partition the corpus, ECE is the " +
      "n-weighted mean gap") {
    val rows = operators.TextStats
      .q250CalibrationReport(TestSpark.spark, TestSpark.sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val nDocs = graft.Tables.documents(TestSpark.spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    val ece = rows.head.getAs[Double]("ece")
    assert(ece > 0.0 && ece < 1.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("ece") == ece) // one constant, every row
      assert(math.abs(r.getAs[Double]("gap") -
        math.abs(r.getAs[Double]("avg_p") - r.getAs[Double]("pos_rate")))
        < 1e-9)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
    // the recomputed weighted gap must reproduce the attached ECE
    val recomputed = rows.map(r => r.getAs[Long]("n") *
      r.getAs[Double]("gap")).sum / nDocs
    assert(math.abs(recomputed - ece) < 1e-6)
  }

  test("k-anonymity histogram accounts for every customer row and " +
      "flags exactly the sub-k classes") {
    val rows = operators.Quality
      .q265KAnonymity(TestSpark.spark, TestSpark.sf).collect()
    val nCust = graft.Tables.customer(TestSpark.spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nCust)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") ==
        r.getAs[Long]("class_size") * r.getAs[Long]("n_classes"))
      assert(r.getAs[Boolean]("at_risk") ==
        (r.getAs[Long]("class_size") < 5L))
    }
    // the dataset's k-anonymity is the smallest observed class size
    val k = rows.map(_.getAs[Long]("class_size")).min
    assert(k >= 1L)
  }

  test("MAD outlier report: median/MAD are robust centers and the " +
      "flag rate stays in the tail") {
    val rows = operators.Quality
      .q268MadOutliers(TestSpark.spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, out) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_outliers"))
      assert(out <= n)
      assert(r.getAs[Double]("mad") >= 0.0)
      // a 3-sigma-equivalent robust gate can never flag half a source:
      // by construction at least half the docs sit within one MAD
      assert(out.toDouble / n < 0.5)
      assert(math.abs(r.getAs[Double]("outlier_rate") -
        out.toDouble / n) < 1e-6)
    }
  }

  test("CMS certificate: estimates only ever overestimate and all " +
      "probes sit within the 3N/W bound") {
    val rows = operators.TextStats.q264CmsCert(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // collisions only ADD counts: est >= exact is structural
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"))
      assert(r.getAs[Long]("err") ==
        r.getAs[Long]("est_cnt") - r.getAs[Long]("exact_cnt"))
      // with d=4 rows the 3N/W Markov bound failing on any probe has
      // prob < (1/3)^4; the oracle hash pins the same flags
      assert(r.getAs[Boolean]("within_bound"))
    }
  }

  test("l-diversity histogram accounts for every customer row and " +
      "l is bounded by the sensitive domain") {
    val rows = operators.Quality.q266LDiversity(spark, sf).collect()
    val nCust = graft.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nCust)
    rows.foreach { r =>
      val l = r.getAs[Long]("l_div")
      // 5 market segments bound the achievable diversity
      assert(l >= 1L && l <= 5L)
      assert(r.getAs[Boolean]("at_risk") == (l < 3L))
      assert(r.getAs[Long]("n_rows") >= r.getAs[Long]("n_classes") * l)
    }
  }

  test("BPE encoding compresses every language and the symbol deficit " +
      "equals the merge applications") {
    val rows = operators.TextStats.q267BpeEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val before = r.getAs[Long]("symbols_before")
      val after = r.getAs[Long]("symbols_after")
      // 3 merges learned on the global corpus must fire in every lang
      // of this fixture (top pairs are corpus-wide frequent)
      assert(after < before)
      assert(r.getAs[Long]("merge_applications") == before - after)
      val c = r.getAs[Double]("compression")
      assert(c > 0.0 && c < 1.0)
      // a word of n chars has n symbols before any merge
      assert(before >= r.getAs[Long]("n_words"))
    }
  }

  test("jackknife SE: positive-finite wobble, shards partition each " +
      "source, mean matches the direct mean") {
    val rows = operators.Quality.q282JackknifeSe(spark, sf).collect()
    assert(rows.nonEmpty)
    val direct = operators.TextStats.hashedScores(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("source"))
      .agg(org.apache.spark.sql.functions.avg("score").as("m"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("m"), r.getAs[Long]("n"))).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_shards") >= 2 &&
        r.getAs[Long]("n_shards") <= 16)
      assert(r.getAs[Long]("n_docs") == direct(src)._2)
      assert(math.abs(r.getAs[Double]("mean_score") - direct(src)._1)
        < 1e-6)
      val se = r.getAs[Double]("se_jack")
      assert(se >= 0.0 && se < 1.0 && !se.isNaN)
    }
  }

  test("robust clip leaves zero residuals outside the band and moves " +
      "only tail mass") {
    val rows = operators.Quality.q269RobustClip(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the certificate: clipping into [med-3sigma, med+3sigma] can
      // leave nothing outside it
      assert(r.getAs[Long]("n_residual") == 0L)
      val n = r.getAs[Long]("n_docs")
      val clipped = r.getAs[Long]("n_clipped_lo") +
        r.getAs[Long]("n_clipped_hi")
      // by construction at least half of every source is within one
      // MAD of its median — a 3-sigma clip touches only the tail
      assert(clipped < n / 2)
      assert(r.getAs[Double]("mass_moved") >= 0.0)
      if (clipped == 0) assert(r.getAs[Double]("mass_moved") == 0.0)
    }
  }

  test("PMI collocations equal the brute-force top-20 on the fixture") {
    import org.apache.spark.sql.functions.col
    val got = TextStats.q291PmiCollocations(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 20)
    // sorted by pmi desc with (w1, w2) tie-break
    got.sliding(2).foreach { case Array(a, b) =>
      val (pa, pb) = (a.getAs[Double]("pmi"), b.getAs[Double]("pmi"))
      assert(pa > pb || (pa == pb &&
        (a.getAs[String]("w1") < b.getAs[String]("w1") ||
          (a.getAs[String]("w1") == b.getAs[String]("w1") &&
            a.getAs[String]("w2") < b.getAs[String]("w2")))))
    case _ => ()
    }
    // brute force, driver-side, over the same event space
    val bigrams = graft.Tables.documents(spark, sf)
      .select(col("text")).collect().flatMap { r =>
        val w = r.getString(0).toLowerCase.replaceAll("\\s+", " ")
          .trim.split(" ")
        if (w.length >= 2) w.sliding(2).map(p => (p(0), p(1))) else Nil
      }
    val n = bigrams.length.toDouble
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val c1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length }
    val c2 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length }
    val expected = c12.toSeq.filter(_._2 >= 5).map { case ((a, b), c) =>
      val pmi = math.log(c.toDouble * n / (c1(a).toDouble * c2(b).toDouble))
      (a, b, c.toLong, BigDecimal(pmi).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(20)
    assert(got.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
      r.getAs[Long]("c12"), r.getAs[Double]("pmi"))).toSeq == expected)
  }
}
