package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols

/** Text-analysis operators over the `documents` table — the LLM-pipeline
  * extension surface (north star "text analysis"): corpus statistics,
  * heuristic language ID, quality scoring, tokenizer-style token counts,
  * and content fingerprinting.
  *
  * Every operator is a narrow per-row transform followed by at most one
  * aggregation shuffle on low-cardinality keys (lang/source) — the shape
  * that scales linearly to 100 TB. All expressions are native Catalyst
  * (split/filter/transform/regexp) chosen to be bit-reproducible against
  * the DuckDB oracle.
  */
object TextStats {

  private def toks(c: Column): Column = split(Cols.normText(c), " ")

  /** Corpus statistics per (lang, source): doc counts, char and token
    * totals/averages. Partial aggregation makes the shuffle carry one
    * row per (lang, source) per partition. */
  def q31TextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(toks(col("text"))).as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") /
          count(lit(1)).cast("double")).as("avg_chars"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        (sum(col("n_tokens").cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("avg_tokens"))
      .orderBy(col("lang"), col("source"))

  /** Marker-token profiles for the heuristic classifier. On this
    * synthetic corpus only the English markers occur — the operator is
    * validated by the oracle on its computation; accuracy is a property
    * of the data, not the machinery. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "fr" -> Seq("le", "la", "les"),
    "de" -> Seq("der", "die", "das"),
    "es" -> Seq("el", "los", "una"))

  private def markerScore(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isin(markers.map(lit): _*)))

  /** Shared core of q32/q222: per-document heuristic language
    * prediction (marker-token argmax, first-wins tie-break
    * en>fr>de>es) next to the labeled lang column. Pure narrow
    * expressions — one scan pass, no shuffle. */
  private[graft] def langPredictions(spark: SparkSession,
      dir: String): DataFrame = {
    val scoredCols = langMarkers.map { case (l, ms) =>
      markerScore(col("w"), ms).as(s"s_$l")
    }
    val predicted =
      when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de") &&
        col("s_en") >= col("s_es"), "en")
        .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_es"), "fr")
        .when(col("s_de") >= col("s_es"), "de")
        .otherwise("es")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), toks(col("text")).as("w"))
      .select(col("doc_id") +: col("lang") +: scoredCols: _*)
      .withColumn("predicted", predicted)
      .select(col("doc_id"), col("lang"), col("predicted"))
  }

  /** Heuristic language ID: score each language profile by marker-token
    * hits, predict the argmax (first-wins tie-break en>fr>de>es), and
    * emit the confusion matrix against the labeled lang column. */
  def q32LangId(spark: SparkSession, dir: String): DataFrame =
    langPredictions(spark, dir)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))

  /** Cohen's kappa between the labeled `lang` column and the q32
    * heuristic classifier — the chance-corrected agreement score a
    * pipeline publishes when it swaps in a cheaper labeler (is the
    * heuristic actually agreeing with the reference labels beyond
    * what marginal-frequency luck predicts?).
    *
    * Everything after the single corpus-wide confusion aggregate is
    * metadata-sized: the |L|x|L| matrix re-aggregates into marginals
    * and the expected-agreement cross term, so po/pe/kappa are ratios
    * of exact BIGINT counts — deterministic doubles regardless of
    * partitioning, and the whole tail of the plan is driver-trivial
    * at any corpus size. */
  def q222KappaAgreement(spark: SparkSession, dir: String): DataFrame = {
    val conf = langPredictions(spark, dir)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val tot = conf.agg(
      sum(col("n")).as("n_docs"),
      sum(when(col("lang") === col("predicted"), col("n")).otherwise(0L))
        .as("n_agree"))
    val rowMarg = conf.groupBy(col("lang").as("label"))
      .agg(sum(col("n")).as("r"))
    val colMarg = conf.groupBy(col("predicted").as("label"))
      .agg(sum(col("n")).as("c"))
    val cross = rowMarg.join(colMarg, "label")
      .agg(sum(col("r") * col("c")).as("rc"))
    tot.crossJoin(cross)
      .select(col("n_docs"), col("n_agree"),
        (col("n_agree").cast("double") / col("n_docs").cast("double"))
          .as("po"),
        (col("rc").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double")))
          .as("pe"))
      .select(col("n_docs"), col("n_agree"), col("po"), col("pe"),
        ((col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
  }

  /** Per-document quality scoring: token counts, characters per token,
    * stopword and digit ratios, bucketed into high/medium/low. The
    * classic pre-training corpus filter, as pure narrow expressions. */
  def q33QualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScored(Tables.documents(spark, dir))
      .orderBy(col("doc_id"))

  /** Unordered core of q33 over any documents-shaped frame — the
    * consumers that aggregate immediately (q224's dup-interaction
    * report, q225's budget selection) reuse this without paying q33's
    * display sort. */
  private[graft] def qualityScored(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        Cols.normText(col("text")).as("norm"),
        toks(col("text")).as("w"))
      .select(
        col("doc_id"), col("lang"),
        size(col("w")).as("n_tokens"),
        // chars-per-token over the space-stripped normalized text
        (length(regexp_replace(col("norm"), " ", "")).cast("double") /
          size(col("w")).cast("double")).as("avg_token_len"),
        (size(filter(col("w"), t => t.isin("the", "a"))).cast("double") /
          size(col("w")).cast("double")).as("stopword_ratio"),
        (length(regexp_replace(col("norm"), "[^0-9]", "")).cast("double") /
          length(col("norm")).cast("double")).as("digit_ratio"))
      .withColumn("quality",
        when(col("n_tokens") >= 50 && col("stopword_ratio") <= 0.2, "high")
          .when(col("n_tokens") >= 20, "medium")
          .otherwise("low"))
      .orderBy(col("doc_id"))

  /** Tokenizer-style (BPE-ish) token counting: runs of letters, runs of
    * digits, or single non-alphanumeric symbols — the standard
    * pre-tokenizer split — counted per language alongside whitespace
    * tokens and the distinct-word vocabulary size. */
  def q34TokenCount(spark: SparkSession, dir: String): DataFrame = {
    val bpe = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    val perDoc = Tables.documents(spark, dir)
      .select(col("lang"),
        size(regexp_extract_all(Cols.normText(col("text")), lit(bpe), lit(0)))
          .cast("long").as("n_bpe"),
        toks(col("text")).as("w"))
    // token totals aggregate per-doc rows; vocabulary needs the exploded
    // words — two small shuffles on lang, joined at 5 rows
    val sums = perDoc.groupBy(col("lang"))
      .agg(sum(col("n_bpe")).as("total_bpe"),
        sum(size(col("w")).cast("long")).as("total_ws"))
    val vocab = perDoc.select(col("lang"), explode(col("w")).as("word"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("word")).as("vocab"))
    sums.join(vocab, "lang").orderBy(col("lang"))
  }

  /** Top-5 word bigrams per language — n-gram frequency analysis via
    * explode (LATERAL-VIEW semantics) + count + per-group rank. The
    * explode multiplies rows before one (lang, bigram) shuffle with
    * partial aggregation, so the exchange carries counts, not tokens. */
  def q65TopBigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("n").desc, col("bigram").asc)
    Tables.documents(spark, dir)
      .select(col("lang"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
        .as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rn"))
  }

  /** TF-IDF: top-3 terms per document by tf·ln(N/df) for the probe
    * docs (doc_id < 20), with document frequencies computed over the
    * FULL corpus. Two shuffles — (doc, word) term counts and per-word
    * document frequencies — joined on word; the df table is corpus-
    * vocabulary-sized (small, broadcastable) while the tf side stays
    * partitioned by doc. Scores round to 9 decimals to absorb the
    * last-ulp difference between the engines' ln implementations. */
  def q70Tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val words = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val df = words.select(col("doc_id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val tf = words.filter(col("doc_id") < 20)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf").cast("double") *
          log(col("n_total").cast("double") / col("df").cast("double")), 9))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("word"), col("tf"),
        col("df"), col("score"))
      .orderBy(col("doc_id"), col("rn"))
  }

  /** Content fingerprint per document: the minimum md5 over all 8-char
    * shingles of the normalized text (min-hash winnowing, k=1). Rolling
    * O(len) shingle set per row, no shuffle; md5 keeps it portable to
    * the oracle. */
  def q35DocFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // md5-per-position is CPU-bound: spread the few source files'
      // rows over all cores before sketching
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), Cols.normText(col("text")).as("norm"))
      .filter(length(col("norm")) >= 8)
      .select(col("doc_id"),
        (length(col("norm")) - 7).as("n_shingles"),
        graft.functions.TextExprs.minShingleMd5(col("norm"), 8).as("fp"))
      .orderBy(col("doc_id"))

  /** Cross-language vocabulary overlap: top-50 words per language
    * (count desc, word asc — deterministic), then pairwise set algebra
    * (array_intersect / array_union) for a corpus-similarity matrix.
    * The word ranking shuffles once on (lang, word); the pair join
    * runs over one 50-element array per language — dimension-sized. */
  def q123VocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("word").asc)
    val top = Tables.documents(spark, dir)
      .select(col("lang"), explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50)
      .groupBy(col("lang"))
      .agg(sort_array(collect_list(col("word"))).as("vocab"))
    val a = top.select(col("lang").as("lang_a"), col("vocab").as("va"))
    val b = top.select(col("lang").as("lang_b"), col("vocab").as("vb"))
    a.join(b, col("lang_a") < col("lang_b"))
      .select(col("lang_a"), col("lang_b"),
        size(array_intersect(col("va"), col("vb"))).as("n_common"),
        round(size(array_intersect(col("va"), col("vb"))).cast("double")
          / size(array_union(col("va"), col("vb"))).cast("double"), 9)
          .as("vocab_jaccard"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** RAG-style chunking: each document sliced into 200-char windows
    * with 100-char stride (the overlap preserves context across chunk
    * boundaries). Pure narrow explode — ~len/100 rows per doc, no
    * shuffle before the output sort; chunk identity is (doc, index) +
    * content hash so downstream embedding/indexing stages can dedup
    * re-chunked documents cheaply. */
  def q121Chunking(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Cols.normText(col("text")).as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("doc_id"),
        expr("""posexplode(transform(
            sequence(0, CAST((length(norm) - 1) DIV 100 AS INT)),
            k -> substring(norm, k * 100 + 1, 200)))""")
          .as(Seq("chunk_ix", "chunk")))
      .select(col("doc_id"), col("chunk_ix"),
        length(col("chunk")).as("chunk_len"),
        md5(col("chunk")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_ix"))

  /** Intra-document repetition (the Gopher/RefinedWeb "repetition
    * removal" signal): segment each doc on sentence boundaries, count
    * duplicate segments, and report the repetition ratio. Pure narrow
    * array ops — no shuffle before the output sort. */
  def q114IntradocRepetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("filter(transform(split(lower(text), '\\\\. '), " +
          "s -> trim(s)), s -> s <> '')").as("segs"))
      .filter(size(col("segs")) >= 1)
      .select(col("doc_id"),
        size(col("segs")).as("n_segments"),
        size(array_distinct(col("segs"))).as("n_unique"),
        round(lit(1.0) - size(array_distinct(col("segs"))).cast("double")
          / size(col("segs")).cast("double"), 9).as("repetition_ratio"))
      .orderBy(col("doc_id"))

  /** Gopher-style heuristic quality rules as named boolean columns +
    * an overall verdict — the canonical pre-training document filter
    * (word-count window, mean-word-length window, stopword presence,
    * alpha-word fraction). One narrow pass; at 100 TB this is the
    * cheap first gate before any model-based scoring. */
  def q115GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val w = toks(col("text"))
    val nTok = size(w)
    val meanLen = length(regexp_replace(Cols.normText(col("text")), " ", ""))
      .cast("double") / nTok.cast("double")
    val stopHits = size(expr(
      "filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')," +
        " t -> t IN ('the', 'a', 'of', 'to', 'and'))"))
    val alphaFrac = size(expr(
      "filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')," +
        " t -> t rlike '^[a-z]+$')")).cast("double") / nTok.cast("double")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        nTok.as("n_tokens"),
        (nTok.between(20, 100000)).as("ok_length"),
        meanLen.between(2.0, 12.0).as("ok_mean_word_len"),
        (stopHits >= 1).as("ok_stopwords"),
        round(alphaFrac, 9).as("alpha_frac"),
        (alphaFrac >= 0.5).as("ok_alpha"))
      .withColumn("pass",
        col("ok_length") && col("ok_mean_word_len") &&
          col("ok_stopwords") && col("ok_alpha"))
      .orderBy(col("doc_id"))
  }

  /** Unigram language-model scoring (the CCNet-style quality signal):
    * corpus unigram log-probabilities, then each probe document's mean
    * token log-prob — low scores flag out-of-distribution text. Per-
    * term log-probs are rounded to 9 decimals and summed as exact
    * DECIMALs, so the per-doc sum is order-independent and the oracle
    * hash-matches despite floating-point ln. The vocabulary table
    * broadcasts here; at 100 TB vocabulary you'd keep the top-V terms
    * (covering ~99.9% of mass) to stay broadcastable, or fall back to
    * a partitioned join on word. */
  def q145UnigramLm(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val total = words.agg(count(lit(1)).as("n_total"))
    val probs = words.groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .select(col("word"),
        round(log(col("cnt").cast("double") /
          col("n_total").cast("double")), 9)
          .cast("decimal(18,9)").as("lp"))
    words.filter(col("doc_id") < 30)
      .join(broadcast(probs), "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp")).as("lp_sum"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("lp_sum").cast("double") /
          col("n_tokens").cast("double"), 9).as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  /** BM25 document ranking for a keyword query — the IR scoring
    * function search engines actually use (TF-IDF's saturating,
    * length-normalized successor; k1=1.2, b=0.75). Corpus statistics
    * (df, avgdl) come from full scans with tiny aggregated outputs;
    * the per-(doc, term) score is computed in doubles, ROUNDED to 9
    * decimals, then summed per doc as exact DECIMALs — the same
    * order-independence discipline as q145, so ranking is
    * deterministic and hash-checkable. Top-20 by (score, doc_id). */
  def q151Bm25(spark: SparkSession, dir: String): DataFrame =
    bm25Scores(spark, dir)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)

  /** q151's scored frame before the top-20 cut — shared with the
    * hybrid rank fusion (q280), which needs the same lexical arm. */
  private[graft] def bm25Scores(spark: SparkSession,
      dir: String): DataFrame = {
    val query = Seq("the", "data", "model")
    val docs = Tables.documents(spark, dir)
    val words = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val dl = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    val tf = words.filter(col("word").isin(query: _*))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val avgdl = col("total_len").cast("double") /
      col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") -
      col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val norm = col("tf").cast("double") + lit(1.2) *
      (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl)
    val scorePerTerm = round(
      idf * (col("tf").cast("double") * 2.2) / norm, 9)
      .cast("decimal(18,9)")
    tf.join(broadcast(df), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), scorePerTerm.as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).cast("double").as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Sentence segmentation statistics: split on terminal punctuation
    * runs ([.!?]+) — a portable regex segmenter rather than the
    * locale-dependent `sentences()` BreakIterator, for the same
    * cross-engine reason q155 avoids `dayofweek`. Per language:
    * sentence counts and length distribution in words — the doc-shape
    * features used for quality filtering and chunk-size planning. */
  def q156SentenceStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        filter(transform(
          split(Cols.normText(col("text")), "[.!?]+"),
          s => trim(s)), s => s =!= "").as("sents"))
      .select(col("doc_id"), col("lang"),
        explode(col("sents")).as("sent"))
      .select(col("doc_id"), col("lang"),
        size(split(col("sent"), " ")).as("sent_words"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_sents"),
        sum(col("sent_words").cast("long")).as("total_sent_words"),
        min(col("sent_words")).as("min_sent_words"),
        max(col("sent_words")).as("max_sent_words"))
      .orderBy(col("lang"))

  /** Feature hashing (the "hashing trick"): categorical values map to
    * a fixed-width feature index via a PORTABLE digest (first 8 md5
    * hex chars mod dim) — murmur-based `hash()` would be engine-
    * specific, md5 reproduces anywhere, which is what makes hashed
    * feature spaces stable across the training and serving stacks.
    * Output: per-bucket population for (lang × source) crossed
    * features in a 64-bucket space, plus collision accounting. */
  def q157FeatureHashing(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        // null-PROPAGATING concat (matches SQL ||); concat_ws would
        // silently fold a null side into the non-null one's bucket
        concat(col("lang"), lit("|"), col("source")).as("feat"))
      .withColumn("bucket",
        (conv(substring(md5(col("feat")), 1, 8), 16, 10).cast("long")
          % 64).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("feat")).as("n_distinct_feats"),
        min(col("feat")).as("first_feat"))
      .orderBy(col("bucket"))

  /** Vocabulary coverage / OOV-rate report: build the top-16 corpus
    * vocabulary (by frequency, deterministic tie-break on the word),
    * then measure what fraction of each language's token stream falls
    * outside it — the tokenizer-health metric that decides vocab size
    * (a lang with high OOV under a shared vocab degrades to byte
    * fallback at training time). The vocab is tiny and broadcasts;
    * the token stream is counted per (lang, word) BEFORE the join so
    * the anti-join probe carries vocabulary-sized cardinality, not
    * one row per token. */
  def q161OovRate(spark: SparkSession, dir: String): DataFrame = {
    // tokenize ONCE: the (lang, word) counts are vocabulary-sized, so
    // checkpointing them is cheap and the three consumers below
    // (vocab build, OOV probe, totals) don't each re-explode the
    // corpus through the scan
    val wordCounts = Tables.documents(spark, dir)
      .select(col("lang"), explode(toks(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val vocabW = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("word").asc)
    val vocab = wordCounts.groupBy(col("word"))
      .agg(sum(col("n")).as("cnt"))
      .withColumn("rk", row_number().over(vocabW))
      .filter(col("rk") <= 16)
      .select(col("word"))
    val oov = wordCounts.join(broadcast(vocab), Seq("word"), "left_anti")
      .groupBy(col("lang")).agg(sum(col("n")).as("oov"))
    // LEFT join + coalesce: a language with perfect coverage must
    // report oov_tokens = 0, not vanish from the report
    wordCounts.groupBy(col("lang"))
      .agg(sum(col("n")).as("total_tokens"))
      .join(oov, Seq("lang"), "left")
      .select(col("lang"), col("total_tokens"),
        coalesce(col("oov"), lit(0L)).as("oov_tokens"),
        round(coalesce(col("oov"), lit(0L)).cast("double") /
          col("total_tokens").cast("double"), 9).as("oov_rate"))
      .orderBy(col("lang"))
  }

  /** Context-window truncation loss: with a 2048-token budget per
    * document, how many tokens would truncation discard, per language
    * — the report that decides sequence length (vs packing, q57, which
    * wastes nothing but reorders). Pure per-row arithmetic on token
    * counts plus one rollup. */
  def q162TruncationLoss(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(toks(col("text"))).cast("long").as("n_tok"))
      .select(col("lang"), col("n_tok"),
        greatest(col("n_tok") - budget, lit(0L)).as("lost"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum((col("n_tok") > budget).cast("long")).as("n_truncated_docs"),
        sum(col("lost")).as("tokens_lost"),
        round(sum(col("lost")).cast("double") /
          sum(col("n_tok")).cast("double"), 9).as("loss_rate"))
      .orderBy(col("lang"))
  }

  /** Data-mixture weights: per-language token totals → a uniform
    * target share → the sampling rate (capped at 1) that rebalances
    * the corpus toward it. The arithmetic a training-data pipeline
    * runs before sampling (q56) and packing (q57): decide how much of
    * each source/language to take. Token totals are exact integers;
    * the single-row grand total broadcasts, so the "global" step adds
    * no shuffle beyond the per-lang aggregate. */
  def q142DataMixture(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .select(col("lang"), size(toks(col("text"))).cast("long").as("n"))
      .groupBy(col("lang")).agg(sum(col("n")).as("total_tokens"))
    val grand = perLang.agg(
      sum(col("total_tokens")).as("grand"),
      count(lit(1)).as("n_langs"))
    val target = col("grand").cast("double") / col("n_langs")
    perLang.crossJoin(broadcast(grand))
      .select(col("lang"), col("total_tokens"),
        round(target, 3).as("target_tokens"),
        round(least(lit(1.0),
          target / col("total_tokens").cast("double")), 9)
          .as("sample_rate"))
      .orderBy(col("lang"))
  }

  /** Binary encoding chain: md5 hex → `unhex` to raw 16 bytes →
    * `base64` — the digest-interchange path used when content hashes
    * leave the engine (manifest files, dedup ledgers). Taking the
    * per-group MIN of the hex digest first makes the encoded value
    * deterministic; `octet_length` proves the hex→binary halving.
    * All narrow expressions inside codegen, one tiny aggregation. */
  def q169BinaryEncode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), md5(col("text")).as("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("h")).as("min_hex"))
      .select(col("lang"), col("n_docs"),
        col("min_hex"),
        length(col("min_hex")).as("hex_len"),
        octet_length(unhex(col("min_hex"))).as("raw_len"),
        base64(unhex(col("min_hex"))).as("digest_b64"))
      .orderBy(col("lang"))

  /** Regexp analytics toolkit (SURVEY §2B names `regexp_count`
    * explicitly): occurrence counts, boolean match, first-match
    * position (`regexp_instr`), extract-all tokenization, and
    * first-match extraction (`regexp_substr`), aggregated per lang.
    * All are narrow codegen'd expressions evaluated in one scan pass —
    * the per-row cost is the regex automaton, not the plan shape, so
    * the query scales linearly with corpus bytes. */
  def q173RegexpToolkit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit("\\btable\\b")))
          .as("table_mentions"),
        count_if(col("text").rlike("\\bspark\\b")).as("spark_docs"),
        sum(expr("regexp_instr(text, 'spark')")).as("spark_pos_sum"),
        sum(size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))))
          .as("n_words"),
        min(regexp_substr(col("text"), lit("\\bs[a-z]+")))
          .as("first_s_word"))
      .orderBy(col("lang"))

  /** Per-document character-level Shannon entropy — the cheapest
    * gibberish/spam signal in an LLM cleaning stack (random bytes score
    * high, repeated-character junk scores near zero). Shape: one
    * explode to chars, two partial aggregations. Determinism: the
    * irrational `c·log2(c)` terms are folded over a SORTED count list
    * sequentially, so the double result is bitwise identical across
    * engines and partitionings; `H = log2(N) − S/N` is then pure
    * scalar arithmetic on identical inputs. */
  def q178CharEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(regexp_extract_all(col("text"), lit("."), lit(0)))
          .as("ch"))
      .groupBy(col("doc_id"), col("lang"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        sort_array(collect_list(col("cnt"))).as("cnts"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("distinct_chars"),
        round(log2(col("n_chars").cast("double")) -
          expr("aggregate(cnts, 0.0D, (a, c) -> " +
            "a + CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))") /
          col("n_chars").cast("double"), 9).as("entropy"))
      .orderBy(col("doc_id"))

  /** BPE bootstrap: corpus-wide adjacent-character-pair frequencies —
    * the statistic the first merge round of byte-pair-encoding
    * tokenizer training maximizes. Pairs are generated per word with a
    * native transform over index `sequence`s (explicit `length >= 2`
    * guard: Spark's argless `sequence(1, 0)` steps DOWNWARD, it is not
    * empty), counted with map-side partial aggregation, and top-20 is
    * a TakeOrderedAndProject with a total (count, pair) order — per-
    * partition heaps, no global sort, at any corpus size. */
  def q179BpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** Zipf-law fit over the top-1000 corpus tokens: least-squares slope
    * / intercept / R² of log(freq) against log(rank) — the classic
    * sanity check that a corpus is natural language (slope ≈ −1) and
    * not template spam. The top-k is a TakeOrderedAndProject (per-
    * partition heaps); only the 1000 survivors see a window, so the
    * single-partition rank is bounded at k forever. Determinism: the
    * irrational logs are rounded to 9 decimals and cast to decimal, so
    * every regression power sum is EXACT decimal arithmetic —
    * order-free, no float folds at all. */
  def q191ZipfFit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("freq").desc, col("tok"))
    val dec9 = (c: Column) => round(c, 9).cast("decimal(18,9)")
    Tables.documents(spark, dir)
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(1000)
      .withColumn("rank", row_number().over(w))
      .select(
        dec9(log(col("rank").cast("double"))).as("lx"),
        dec9(log(col("freq").cast("double"))).as("ly"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("lx")).cast("double").as("sx"),
        sum(col("ly")).cast("double").as("sy"),
        sum(col("lx") * col("lx")).cast("double").as("sxx"),
        sum(col("lx") * col("ly")).cast("double").as("sxy"),
        sum(col("ly") * col("ly")).cast("double").as("syy"))
      .select(col("n").cast("long").as("n_tokens"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 9)
          .as("zipf_slope"),
        round((col("sy") - col("sx") *
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"),
          9).as("intercept"),
        round(((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 9)
          .as("r2"))
  }

  /** q220: token-distribution drift between two corpus snapshots
    * (halves by doc_id parity here; in production, yesterday's mixture
    * vs today's) — symmetric KL divergence with add-one smoothing over
    * the joint vocabulary. The drift monitor a data-mixture pipeline
    * alarms on: a slope in KL means a source started over- or
    * under-contributing long before eyeballing samples would catch it.
    *
    * Determinism is q191's recipe: each irrational per-token term
    * p·ln(p/q) rounds to 9 decimals and casts to decimal(18,9), so the
    * cross-vocabulary sums are EXACT decimal arithmetic — order-free
    * under any shuffle, hash-identical in the oracle. One shuffle on
    * the token; the two scalar totals ride a 1-row cross join. */
  def q220CorpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val dec9 = (c: Column) => round(c, 9).cast("decimal(18,9)")
    val tok = Tables.documents(spark, dir)
      .select((col("doc_id") % 2).cast("int").as("half"),
        explode(toks(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val counts = tok.groupBy(col("tok"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"))
      .localCheckpoint(eager = false) // totals + terms both consume it
    val totals = counts.agg(sum(col("n_a")).as("tot_a"),
      sum(col("n_b")).as("tot_b"), count(lit(1)).as("v"))
    val terms = counts.crossJoin(totals)
      .select(
        ((col("n_a") + 1).cast("double") /
          (col("tot_a") + col("v")).cast("double")).as("p"),
        ((col("n_b") + 1).cast("double") /
          (col("tot_b") + col("v")).cast("double")).as("q"))
      .select(dec9(col("p") * log(col("p") / col("q"))).as("t_ab"),
        dec9(col("q") * log(col("q") / col("p"))).as("t_ba"))
    terms.agg(sum(col("t_ab")).as("s_ab"), sum(col("t_ba")).as("s_ba"))
      .crossJoin(totals)
      .select(col("v").as("n_vocab"), col("tot_a").as("n_tokens_a"),
        col("tot_b").as("n_tokens_b"),
        round(col("s_ab").cast("double"), 9).as("kl_ab"),
        round(col("s_ba").cast("double"), 9).as("kl_ba"))
  }

  /** Filter-waterfall report: q115's Gopher gates applied in a fixed
    * order, with per-stage attrition — the "where did my data go"
    * accounting a cleaning pipeline publishes next to its output.
    * Each document is charged to the FIRST gate it fails; the
    * waterfall is then four rows of closed-form arithmetic over one
    * tiny aggregate, so the report adds one scan regardless of corpus
    * size. */
  def q193FilterWaterfall(spark: SparkSession, dir: String): DataFrame = {
    val w = toks(col("text"))
    val nTok = size(w)
    val meanLen = length(regexp_replace(Cols.normText(col("text")), " ", ""))
      .cast("double") / nTok.cast("double")
    val stopHits = size(expr(
      "filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')," +
        " t -> t IN ('the', 'a', 'of', 'to', 'and'))"))
    val alphaFrac = size(expr(
      "filter(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')," +
        " t -> t rlike '^[a-z]+$')")).cast("double") / nTok.cast("double")
    val firstFail = when(!nTok.between(20, 100000), 1)
      .when(!meanLen.between(2.0, 12.0), 2)
      .when(stopHits < 1, 3)
      .when(alphaFrac < 0.5, 4)
      .otherwise(0)
    Tables.documents(spark, dir)
      .select(firstFail.as("ff"))
      .agg(count(lit(1)).as("total"),
        count_if(col("ff") === 1).as("d1"),
        count_if(col("ff") === 2).as("d2"),
        count_if(col("ff") === 3).as("d3"),
        count_if(col("ff") === 4).as("d4"))
      .select(expr("""inline(array(
        struct(1 AS stage, 'length' AS gate, total AS n_entering,
          d1 AS n_dropped, total - d1 AS n_surviving),
        struct(2 AS stage, 'mean_word_len' AS gate,
          total - d1 AS n_entering, d2 AS n_dropped,
          total - d1 - d2 AS n_surviving),
        struct(3 AS stage, 'stopwords' AS gate,
          total - d1 - d2 AS n_entering, d3 AS n_dropped,
          total - d1 - d2 - d3 AS n_surviving),
        struct(4 AS stage, 'alpha_frac' AS gate,
          total - d1 - d2 - d3 AS n_entering, d4 AS n_dropped,
          total - d1 - d2 - d3 - d4 AS n_surviving)))"""))
      .orderBy(col("stage"))
  }

  /** Crawl-policy enforcement over provenance domains: a deny-list
    * anti-join removes blocked hosts entirely, then a per-host cap
    * keeps the 15 longest documents (deterministic (n_chars, doc_id)
    * rank) — the domain-budget rule crawl curation applies so one
    * giant domain cannot dominate the corpus. Anti-join on a tiny
    * broadcast list + one window per host partition: both scale-safe
    * shapes. */
  def q194DomainPolicy(spark: SparkSession, dir: String): DataFrame = {
    val denied = Seq("src3.example.com", "src7.example.com")
    val host = concat(col("source"), lit(".example.com"))
    val w = Window.partitionBy(col("host"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.documents(spark, dir)
      .select(host.as("host"), col("doc_id"), col("n_chars"))
      .filter(!col("host").isin(denied: _*))
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("rnk") <= 15).as("n_kept"),
        count_if(col("rnk") > 15).as("n_capped"),
        sum(when(col("rnk") <= 15, col("n_chars")).otherwise(lit(0)))
          .as("kept_chars"))
      .orderBy(col("host"))
  }

  /** URL parsing toolkit: documents addressed by deterministic
    * provenance URLs (built from source/lang/doc_id, as a crawl
    * manifest would carry), then `parse_url` extracts HOST / PATH /
    * a named QUERY parameter — the domain-extraction step every
    * web-corpus filter runs before domain allow/deny lists. The
    * oracle re-derives the parts from the raw columns, so the hash
    * proves the parser against ground truth rather than against
    * another parser. Host-grain aggregation keeps the output tiny. */
  def q176UrlParse(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://"), col("source"),
      lit(".example.com/"), col("lang"), lit("/doc-"), col("doc_id"),
      lit("?q="), split(col("text"), " ").getItem(0))
    Tables.documents(spark, dir)
      .select(parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY"), lit("q")).as("first_word"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("path")).as("n_paths"),
        min(col("path")).as("min_path"),
        countDistinct(col("first_word")).as("n_first_words"))
      .orderBy(col("host"))
  }

  /** Sparse TF-IDF cosine similarity join — similarity search over
    * the corpus' own WEIGHTED TERM vectors, the sparse-text twin of
    * the dense-embedding stack (q27-q30). Features are word-bigram
    * shingles, not single words: a corpus can have a tiny unigram
    * vocabulary where every word is boilerplate (this synthetic one
    * does — 31 words, all df≈400, unigram cosine ≈ 1 for everything),
    * while bigrams keep a discriminating df distribution — the same
    * featureization reasoning as the shingle dedup tier (q25/q68).
    *
    * Scale shape: candidates come from a rare-term inverted index
    * (df <= 20 — the q68 recall contract: boilerplate terms may not
    * generate candidates, so a pair sharing ONLY common terms is
    * missed by design), then each candidate pair is scored EXACTLY
    * over its full weighted vectors via a (doc, term)-keyed join —
    * work is candidates × terms, never n². Float portability: every
    * per-term contribution is rounded to 9 dp and summed as DECIMAL
    * (order-independent — the repo's standard pattern), idf shares
    * q70's oracle-proven `ln`. At 100 TB the weighted-term table is
    * materialized once and reused across the norm/score passes. */
  def q201SparseCosine(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
        .as("term"))
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    // tf feeds three consumers (df table, weights, candidate index)
    // and wtf four plan sites (norms ×2, both score sides) — the lazy
    // checkpoints materialize each ONCE, the in-plan form of "write
    // the weighted-term table, then join it many times" at 100 TB
    // (same pattern as Dedup.shingled)
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val wtf = tf.join(dfr, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf").cast("double") *
          log(col("n_total").cast("double") / col("df").cast("double")),
          9).as("wt"))
      .localCheckpoint(eager = false)
    val norms = wtf.groupBy(col("doc_id"))
      .agg(sqrt(sum(round(col("wt") * col("wt"), 9)
        .cast("decimal(28,9)")).cast("double")).as("norm"))
    val rare = dfr.filter(col("df") <= 20).select(col("term"))
    val ix = tf.join(rare, "term").select(col("term"), col("doc_id"))
    val cand = ix.as("a")
      .join(ix.as("b"),
        col("a.term") === col("b.term") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val wa = wtf.select(col("doc_id").as("doc_a"), col("term"),
      col("wt").as("wt_a"))
    val wb = wtf.select(col("doc_id").as("doc_b"), col("term"),
      col("wt").as("wt_b"))
    cand.join(wa, "doc_a").join(wb, Seq("doc_b", "term"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(round(col("wt_a") * col("wt_b"), 9)
        .cast("decimal(28,9)")).cast("double").as("dotp"))
      .join(norms.select(col("doc_id").as("doc_a"),
        col("norm").as("norm_a")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"),
        col("norm").as("norm_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("dotp") / (col("norm_a") * col("norm_b")), 9)
          .as("cosine"))
      .filter(col("cosine") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Crawl-URL canonicalization + dedup report — the step before any
    * URL-keyed dedup or domain policy: the same page arrives under
    * mixed-case hosts, explicit default ports, tracking parameters,
    * trailing slashes, and fragments, and a URL-keyed pipeline that
    * doesn't canonicalize splits its counts across all of them. Dirty
    * variants are CONSTRUCTED deterministically from the documents
    * columns; the canonicalizer (lowercase host, strip :443 port,
    * strip fragment, drop utm_* params, sort the rest, trim trailing
    * slash) runs through `parse_url` + array HOFs; and the ORACLE
    * re-derives the canonical form from the raw columns — ground
    * truth, not a second parser. Group sizes > 1 are exactly the
    * variants canonicalization merges. */
  def q207UrlCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(
      lit("https://WWW."), upper(col("source")), lit(".Example.COM:443/"),
      col("lang"), lit("/doc-"), (col("doc_id") % 50).cast("string"),
      when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit("?utm_source=feed&id="), (col("doc_id") % 7).cast("string")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("?id="), (col("doc_id") % 7).cast("string"),
            lit("&utm_campaign=x")))
        .otherwise(concat(lit("?id="), (col("doc_id") % 7).cast("string"))),
      lit("#s"), (col("doc_id") % 4).cast("string"))
    val canon = concat(lit("https://"),
      lower(parse_url(col("url"), lit("HOST"))),
      regexp_replace(parse_url(col("url"), lit("PATH")), "/$", ""),
      lit("?"),
      array_join(array_sort(filter(
        split(parse_url(col("url"), lit("QUERY")), "&"),
        p => !p.startsWith("utm_"))), "&"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), dirty.as("url"))
      .select(col("url"), canon.as("canon"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_distinct_raw"))
      .orderBy(col("canon"))
  }

  /** Bigram-LM document scoring — the CCNet-style perplexity quality
    * gate: a bigram language model with add-one smoothing is TRAINED
    * on the train split (doc_id % 10 != 0, the q113 split convention)
    * and every HELD-OUT document is scored by its mean negative log
    * likelihood (exp of which is perplexity). Curation pipelines drop
    * or down-weight documents far from the corpus norm — gibberish
    * and boilerplate both surface as outliers. q145 is the unigram
    * baseline; this one conditions on context.
    *
    * Shape: the bigram/unigram count tables are gram-keyed aggregates
    * over the train stream; scoring LEFT-joins the held-out token
    * stream against them (unseen grams fall back to the add-one
    * floor (0+1)/(0+V)) — the decontamination join shape, never a
    * per-doc loop. V = the train successor vocabulary (distinct w2),
    * matching the modeled space P(w2|w1). Per-token nll is rounded
    * then decimal-summed (the q145/q151 discipline), so the score is
    * order-independent and hash-checkable. */
  def q203BigramPpl(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    def bigrams(df: DataFrame) = df
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(" +
          "element_at(w, i) as w1, element_at(w, i + 1) as w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val train = bigrams(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint(eager = false) // feeds c2, c1, and V
    val c2 = train.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = train.agg(countDistinct(col("w2")).as("v"))
    bigrams(docs.filter(col("doc_id") % 10 === 0))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        round(-log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")), 9)
          .cast("decimal(28,9)").as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") /
          count(lit(1)).cast("double"), 9).as("mean_nll"))
      .orderBy(col("doc_id"))
  }

  /** Hashed linear quality classifier — the fasttext-shaped model
    * application pass: every token hashes into one of 4096 feature
    * buckets (md5 prefix, engine-portable), each bucket carries a
    * fixed signed integer weight (itself md5-derived, standing in for
    * trained parameters shipped as a broadcastable array), and a
    * document's score is the mean bucket weight of its tokens. This is
    * how a trained linear/fasttext quality or language classifier
    * actually runs inside a curation pipeline — a pure per-token
    * lookup + per-doc mean, no model server.
    *
    * Scale shape: ONE narrow codegen pass (hash → weight are
    * expressions, so there isn't even a lookup join) + one doc-keyed
    * aggregate; at 100 TB with a real weight vector the only change is
    * a broadcast of the 4096-float array into the expression. All
    * arithmetic is exact BIGINT until the final double division, so
    * the score is bitwise-portable. */
  def q232HashedClassifier(spark: SparkSession, dir: String): DataFrame =
    hashedScores(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("weight_sum"),
        col("score"))
      .withColumn("label",
        when(col("score") >= 0.02, "keep")
          .when(col("score") >= -0.02, "borderline")
          .otherwise("drop"))
      .orderBy(col("doc_id"))

  /** The q232 scoring pass with the doc's language carried through
    * (functionally dependent on doc_id, so the extra grouping key
    * changes nothing) — shared by the classifier (q232) and its
    * calibration report (q250). */
  private[graft] def hashedScores(spark: SparkSession,
      dir: String): DataFrame = {
    val bucket = pmod(conv(substring(md5(col("word")), 1, 8), 16, 10)
      .cast("long"), lit(4096L))
    val weight = pmod(conv(substring(md5(concat(lit("w"),
      bucket.cast("string"))), 1, 8), 16, 10).cast("long"), lit(2001L)) -
      lit(1000L)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(toks(col("text"))).as("word"))
      .select(col("doc_id"), col("lang"), col("source"), weight.as("wt"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("wt")).as("weight_sum"))
      .withColumn("score",
        round(col("weight_sum").cast("double") /
          (col("n_tokens") * 1000L).cast("double"), 9))
  }

  /** q250: classifier calibration — the reliability diagram + ECE
    * pass a curation team runs before trusting a quality classifier's
    * scores as keep/drop probabilities. Scores min-max-normalize to
    * [0,1] (the two extrema are one metadata aggregate, broadcast
    * back), land in 10 FIXED-WIDTH bins — a pure per-row map, no
    * corpus-wide ntile window — and each bin compares its mean
    * predicted mass against the empirical positive rate (weak label:
    * lang = 'en', the corpus's majority class). ECE is the n-weighted
    * mean absolute gap, attached from a 10-row aggregate.
    *
    * Scale shape: two corpus passes (score, bin-assign+aggregate) and
    * three metadata-sized exchanges (extrema, 10 bins, 1 ECE row).
    * Bin means sum 9-rounded p as exact DECIMAL(28,9), so every
    * reported number is order-independent and hash-checkable. */
  def q250CalibrationReport(spark: SparkSession, dir: String): DataFrame = {
    val s = hashedScores(spark, dir)
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
    val ece = bins.agg(
      round(sum(col("gap").cast("decimal(28,9)") * col("n")).cast("double")
        / sum(col("n")).cast("double"), 9).as("ece"))
    bins.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("avg_p"), col("n_pos"),
        col("pos_rate"), col("gap"), col("ece"))
      .orderBy(col("bin"))
  }

  /** Trigram LM with stupid backoff — the production upgrade of the
    * q203 bigram gate: score held-out documents under
    * S(w3|w1,w2) = c(w1w2w3)/c(w1w2)            if the trigram was seen,
    *             = 0.4 * c(w2w3)/c(w2)          else if the bigram was,
    *             = 0.4^2 * (c(w3)+1)/(N+V)      otherwise (add-one floor
    * so unseen held-out words stay finite). Stupid backoff is the
    * web-scale standard precisely because the scores need no
    * normalization pass — every count is a plain aggregate, which is
    * what makes the model trainable as a handful of gram-keyed
    * groupBys at 100 TB.
    *
    * Shape: four count tables off one checkpointed train token stream
    * (trigram, context-pair, bigram, unigram — each vocabulary-sized,
    * far smaller than the corpus) + two scalars; scoring LEFT-joins the
    * held-out trigram stream against them, shuffling on gram keys the
    * same way q113/q203 do. Per-token backoff scores round to 9
    * decimals then decimal-sum, so the doc score is order-independent
    * and hash-checkable. */
  def q235TrigramBackoff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
    def trigrams(df: DataFrame) = df
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2), i -> struct(" +
          "element_at(w, i) as w1, element_at(w, i + 1) as w2, " +
          "element_at(w, i + 2) as w3))")).as("tg"))
      .select(col("doc_id"), col("tg.w1"), col("tg.w2"), col("tg.w3"))
    val train = trigrams(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint(eager = false) // feeds all four count tables
    val c3 = train.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3"))
    val cCtx = train.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ctx"))
    val cBg = train.groupBy(col("w2").as("b2"), col("w3").as("b3"))
      .agg(count(lit(1)).as("c_bg"))
    // backoff-bigram context denominator c(w2), counted over the SAME
    // event space as cBg (one event per training trigram) — so
    // c_bg <= c_bg_ctx always and c_bg non-null implies c_bg_ctx
    // non-null. Counting w2 from the unigram (trigram-final) table
    // instead would mismatch event spaces: a w2 never seen in final
    // position would null the denominator and the score would exceed 1
    // for others.
    val cBgCtx = train.groupBy(col("w2").as("b2c"))
      .agg(count(lit(1)).as("c_bg_ctx"))
    val cUni = train.groupBy(col("w3").as("u3"))
      .agg(count(lit(1)).as("c_uni"))
    // N counts the same events the unigram table does (trigram-final
    // tokens), so the floor is a true probability over that space; V is
    // the modeled vocabulary.
    val scal = train.agg(count(lit(1)).as("n_tok"),
      countDistinct(col("w3")).as("v"))
    val score =
      when(col("c3").isNotNull,
        col("c3").cast("double") / col("c_ctx").cast("double"))
        .when(col("c_bg").isNotNull && col("c_bg_ctx").isNotNull,
          lit(0.4) * col("c_bg").cast("double") /
            col("c_bg_ctx").cast("double"))
        .otherwise(lit(0.16) *
          (coalesce(col("c_uni"), lit(0L)) + 1L).cast("double") /
          (col("n_tok") + col("v")).cast("double"))
    trigrams(docs.filter(col("doc_id") % 10 === 0))
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(cCtx, Seq("w1", "w2"), "left")
      .join(cBg, col("w2") === col("b2") && col("w3") === col("b3"), "left")
      .join(cBgCtx, col("w2") === col("b2c"), "left")
      .join(cUni, col("w3") === col("u3"), "left")
      .crossJoin(broadcast(scal))
      .select(col("doc_id"),
        round(-log(score), 9).cast("decimal(28,9)").as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(col("nll")).cast("double") /
          count(lit(1)).cast("double"), 9).as("mean_nll"))
      .orderBy(col("doc_id"))
  }

  /** Iterative BPE merge induction — THREE rounds of the byte-pair
    * training loop whose single-round pair profile is q179: symbolize
    * every distinct word as space-separated characters, then per round
    * (a) count adjacent symbol pairs weighted by word frequency,
    * (b) pick the most frequent pair (deterministic tie-break:
    * count desc, left asc, right asc), (c) apply the merge to the
    * vocabulary. This is how a tokenizer is actually induced from a
    * corpus, and the scale shape is the point: after the ONE corpus
    * pass that builds the word-frequency table, every round runs over
    * the VOCABULARY (≪ corpus), the merge decision is a 1-row argmax
    * to the driver (the q148 discipline: a driver-side decision, not a
    * driver-side loop over data), and the merge application is a
    * narrow `replace` over vocab rows. At 100 TB the word table is a
    * few GB and 50k merge rounds run where the data is not.
    *
    * Merge semantics: symbols are space-delimited and the pattern
    * " l r " → " lr " consumes its trailing space, so a run like
    * "a a a" merges left-to-right greedily ("aa a") — both engines'
    * `replace` scan left-to-right non-overlapping, making the oracle
    * exact. The vocabulary is checkpointed per round so round k+1's
    * plan starts from k's result, not a 3-deep replace lineage. */
  def q243BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeMergeList(spark, dir)
      .toDF("merge_round", "lsym", "rsym", "pair_count")
      .orderBy(col("merge_round"))
  }

  /** The q243 training loop, returning the learned merge table as
    * driver-side model state (3 rows — the q248 discipline) so the
    * encoder (q267) can apply it without re-deriving. */
  private[operators] def bpeMergeList(spark: SparkSession,
      dir: String): Seq[(Int, String, String, Long)] = {
    var vocab = Tables.documents(spark, dir)
      .select(explode(toks(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
          array_join(expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
            " "),
          lit(" ")).as("s"),
        col("freq"))
      .localCheckpoint(eager = false)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (round <- 1 to 3) {
      val best = vocab
        .select(col("freq"), split(trim(col("s")), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> struct(" +
            "element_at(a, i) as l, element_at(a, i + 1) as r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()(0)
      val (l, r, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((round, l, r, cnt))
      vocab = vocab.select(
          call_function("replace", col("s"),
            lit(s" $l $r "), lit(s" $l$r ")).as("s"),
          col("freq"))
        .localCheckpoint(eager = false)
    }
    merges.toSeq
  }

  /** q267: BPE ENCODING — apply q243's learned merge table to every
    * word occurrence in the corpus and report, per language, the
    * symbol count before/after and the compression ratio. This is the
    * tokenizer-application half of the q243 pair (train = induce
    * merges over the vocabulary; encode = replay them over the
    * corpus), and the half that actually runs at 100 TB: the merge
    * table is driver-side model state (3 rows here, 50k in
    * production) broadcast into a chained narrow `replace` — pure
    * codegen string work, no join, no shuffle until the final
    * |langs|-row aggregate.
    *
    * Each applied merge fuses two symbols into one, so
    * `symbols_before − symbols_after` equals the number of merge
    * applications — the spec pins that invariant alongside the
    * oracle's hash. Same left-to-right greedy `replace` semantics as
    * q243 (the " l r "→" lr " pattern consumes its trailing space),
    * so the DuckDB oracle replays the identical encoder. */
  def q267BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMergeList(spark, dir)
    val sym0: Column = concat(lit(" "),
      array_join(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        " "),
      lit(" "))
    val encoded = merges.foldLeft(sym0) { case (c, (_, l, r, _)) =>
      call_function("replace", c, lit(s" $l $r "), lit(s" $l$r "))
    }
    Tables.documents(spark, dir)
      .select(col("lang"), explode(toks(col("text"))).as("w"))
      .filter(length(col("w")) >= 1)
      .select(col("lang"),
        length(col("w")).cast("long").as("chars"),
        size(split(trim(encoded), " ")).cast("long").as("symbols"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("chars")).as("symbols_before"),
        sum(col("symbols")).as("symbols_after"))
      .withColumn("merge_applications",
        col("symbols_before") - col("symbols_after"))
      .withColumn("compression",
        round(col("symbols_after").cast("double") /
          col("symbols_before").cast("double"), 9))
      .orderBy(col("lang"))
  }

  /** q264: Count-Min Sketch error certificate — the point-query
    * sketch completing the certificate family (HLL q234, GK q245,
    * top-k q246, merged-HLL q247, MinHash q226): d=4 hash rows ×
    * W=512 counters over the corpus token stream, probed at the 20
    * most frequent words against their exact counts. CMS guarantees
    * est ≥ exact always (collisions only ADD) and est − exact ≤ 3N/W
    * with prob ≥ 1 − (1/3)^d per probe; `within_bound` checks the 3N/W
    * bound in PURE INTEGER arithmetic (err·W ≤ 3·N), so the
    * certificate is hash-checked with zero float portability risk.
    *
    * Scale shape: ONE corpus pass builds the word-frequency table
    * (map-side combinable, vocabulary-sized); the sketch is then
    * folded from the vocab table (×4 row explode over vocab, NOT over
    * the corpus) into d·W = 2048 cells; probes join the broadcast
    * sketch. The md5-derived row hashes are engine-portable, so the
    * oracle rebuilds the identical sketch. */
  def q264CmsCert(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(explode(toks(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    def bucket(row: Column, word: Column): Column =
      pmod(conv(substring(md5(concat(lit("cms"), row.cast("string"),
        lit("|"), word)), 1, 8), 16, 10).cast("long"), lit(512L))
    val hk = wc.select(col("word"), col("cnt"),
        explode(typedlit(List(0, 1, 2, 3))).as("row_i"))
      .withColumn("bucket", bucket(col("row_i"), col("word")))
    val sketch = hk.groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("cnt")).as("bcnt"))
    val n = wc.agg(sum(col("cnt")).as("n_total"))
    val probes = wc.orderBy(col("cnt").desc, col("word")).limit(20)
      .withColumnRenamed("cnt", "exact_cnt")
    probes
      .select(col("word"), col("exact_cnt"),
        explode(typedlit(List(0, 1, 2, 3))).as("row_i"))
      .withColumn("bucket", bucket(col("row_i"), col("word")))
      .join(broadcast(sketch), Seq("row_i", "bucket"))
      .groupBy(col("word"), col("exact_cnt"))
      .agg(min(col("bcnt")).as("est_cnt"))
      .crossJoin(broadcast(n))
      .select(col("word"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("err"),
        ((col("est_cnt") - col("exact_cnt")) * 512L <=
          lit(3L) * col("n_total")).as("within_bound"))
      .orderBy(col("exact_cnt").desc, col("word"))
  }

  /** Token-mass concentration by source, per language — the mixture
    * health-check behind q142's composition report: a language whose
    * token mass concentrates in one crawl source is one takedown or
    * license change away from losing its data. Emits the
    * Herfindahl-Hirschman index (sum of squared shares), Shannon
    * entropy in nats, the top source's share, and the source count.
    *
    * Shape: one corpus aggregate to (lang, source) — metadata-sized —
    * then windowed shares and a |langs|-row reduce; exact BIGINT token
    * sums until the final divisions (the q221 discipline). */
  def q236SourceConcentration(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
      // a source whose docs all tokenize to zero tokens carries no
      // mass: dropping it keeps log(share) finite (Spark's log(0) is
      // NULL and sum() would silently eat the term; DuckDB's ln(0)
      // errors) and keeps n_sources = sources with actual mass
      .filter(col("src_tokens") > 0L)
    val byLang = Window.partitionBy(col("lang"))
    val share = col("src_tokens").cast("double") /
      sum(col("src_tokens")).over(byLang).cast("double")
    bySrc
      .select(col("lang"), col("src_tokens"), share.as("share"))
      // per-source terms round to 9 decimals then decimal-sum (the q203
      // discipline): double addition is order-dependent and Spark's
      // partition order differs from DuckDB's
      .groupBy(col("lang"))
      .agg(sum(col("src_tokens")).as("lang_tokens"),
        count(lit(1)).as("n_sources"),
        sum(round(col("share") * col("share"), 9).cast("decimal(28,9)"))
          .cast("double").as("hhi"),
        sum(round(-col("share") * log(col("share")), 9)
          .cast("decimal(28,9)")).cast("double").as("entropy"),
        round(max(col("share")), 9).as("top_share"))
      .orderBy(col("lang"))
  }

  /** Length-bucket packing report — the batch-shape decision a
    * training pipeline makes after truncation analysis (q162) and
    * before sequence packing (q57): documents binned into 64-token-
    * wide length buckets (top bucket open-ended), per bucket the doc
    * count, token mass, observed max, and the padding waste if every
    * doc were padded to the bucket max — the number that says whether
    * bucketed batching is worth it vs packing. One narrow projection
    * and one small aggregate; all integer arithmetic until the final
    * ratio, so the report is bitwise portable. */
  def q200LengthBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(size(toks(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", least(expr("n_tokens div 64"), lit(7L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        round((max(col("n_tokens")) * count(lit(1)) - sum(col("n_tokens")))
            .cast("double") /
          (max(col("n_tokens")) * count(lit(1))).cast("double"), 9)
          .as("pad_waste_ratio"))
      .orderBy(col("bucket"))

  /** q261: Heaps-law growth certificate over trigram TYPES — the
    * "how fast does genuinely new content appear as the corpus grows"
    * curve that sizes dedup indexes and scaling plans (q191's Zipf
    * fit is the frequency-axis companion). The corpus splits into 10
    * hash chunks; prefix i's type count is the number of trigrams
    * whose FIRST chunk is <= i — one `min(bucket)` aggregate per
    * type, so the whole cumulative curve costs one gram-keyed
    * shuffle, never ten re-scans. The log-log slope β (Heaps
    * exponent) is fitted from exact decimal sums of 9-rounded points,
    * attached to every row from the 10-row table. Sub-linear β < 1 is
    * the certificate that the corpus keeps repeating itself — the
    * economic argument for every dedup tier above. */
  def q261HeapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .select((col("doc_id") % 10).as("b"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("b"), explode(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> array_join(slice(w, i + 1, 3), ' '))")).as("gram"))
    val tb = g.groupBy(col("b")).agg(count(lit(1)).as("t"))
    val vb = g.groupBy(col("gram")).agg(min(col("b")).as("minb"))
      .groupBy(col("minb")).agg(count(lit(1)).as("v"))
    val w10 = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // the unpartitioned window runs over the 10-row chunk table, not
    // corpus rows (the q225 discipline)
    val pre = tb.join(vb, col("b") === col("minb"), "left")
      .select(col("b").as("prefix"),
        sum(col("t")).over(w10).as("n_grams_cum"),
        sum(coalesce(col("v"), lit(0L))).over(w10).as("types_cum"))
    val pts = pre.select(col("prefix"), col("n_grams_cum"),
      col("types_cum"),
      round(log(col("n_grams_cum")), 9).as("x"),
      round(log(col("types_cum")), 9).as("y"))
    val dec = "decimal(28,9)"
    val fit = pts.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).cast("double").as("sx"),
      sum(col("y").cast(dec)).cast("double").as("sy"),
      sum(round(col("x") * col("y"), 9).cast(dec)).cast("double")
        .as("sxy"),
      sum(round(col("x") * col("x"), 9).cast(dec)).cast("double")
        .as("sxx"))
    pts.crossJoin(broadcast(fit))
      .select(col("prefix"), col("n_grams_cum"), col("types_cum"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("beta"))
      .orderBy(col("prefix"))
  }

  /** q291: PMI collocation mining — the top-20 adjacent word pairs by
    * pointwise mutual information, the classic corpus-linguistics
    * "which words belong together" report (and the statistic behind
    * phrase-merging tokenizer passes). One event per adjacent bigram;
    * the marginals are counted over the SAME event space — c1(w) =
    * bigrams with w on the left, c2(w) = bigrams with w on the right
    * (the q235 lesson: mismatched event spaces make ratios exceed 1).
    * PMI = ln(c12·N / (c1·c2)), reported only above min-support 5 so
    * the statistic is stable.
    *
    * Scale shape: one explode pass feeds three gram-keyed partial
    * aggregates and one scalar count (the explode is staged once via
    * localCheckpoint); the final report joins the count tables on
    * their gram keys and ends in TakeOrdered(20) — no corpus-wide
    * sort, no window. */
  def q291PmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables.documents(spark, dir)
      .select(toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(" +
          "element_at(w, i) as w1, element_at(w, i + 1) as w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
      .localCheckpoint(eager = false) // feeds all three counts + N
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val n = bg.agg(count(lit(1)).as("n_bg"))
    c12.filter(col("c12") >= 5)
      .join(c1, "w1")
      .join(c2, "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(col("c12").cast("double") * col("n_bg").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))), 9)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }
}
