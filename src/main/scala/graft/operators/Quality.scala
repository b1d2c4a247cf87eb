package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Cols._

/** Data-quality / robustness surface: inline pipeline metrics
  * (`observe`), null handling (`na.*`), contingency tables
  * (`stat.crosstab`), schema evolution across parquet batches
  * (`mergeSchema`), non-throwing casts (`try_*` — the ANSI-safe 100 TB
  * posture: one malformed value must not kill a 6-hour job), and
  * edit-distance fuzzy matching.
  */
object Quality {

  /** `observe` attaches aggregate metrics to a query WITHOUT a second
    * scan — the production pattern for row-count/quality counters on
    * every pipeline write (a listener streams them to monitoring; here
    * the observed values ARE the result, oracle-checked against a
    * direct aggregation). */
  def q102Observe(spark: SparkSession, dir: String): DataFrame = {
    val obs = Observation("q102_metrics")
    val observed = Tables.orders(spark, dir).observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col("o_totalprice") > 300000, 1)).as("n_big"),
      sum(dec(col("o_totalprice"))).cast("double").as("total"))
    // one DataFrame-level action to materialize the metrics: the noop
    // sink executes the full plan and fires the SQL-execution-end
    // event Observation.get waits on (an RDD-level count would hang —
    // it never reaches the QueryExecutionListener)
    observed.write.format("noop").mode(SaveMode.Overwrite).save()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long], m("n_big").asInstanceOf[Long],
      m("total").asInstanceOf[Double]))
      .toDF("n_rows", "n_big", "total")
  }

  /** DataFrameNaFunctions: nulls injected into lang/n_chars, then
    * repaired with na.fill and summarized. The fill map is one Project
    * — no shuffle beyond the final aggregate. */
  def q103NaFill(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("lang",
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("lang")))
      .withColumn("n_chars",
        when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("n_chars")))
      .na.fill(Map("lang" -> "unknown", "n_chars" -> 0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))

  /** Contingency table via stat.crosstab — status × priority counts
    * as a wide table (the quick data-exploration primitive). */
  def q104Crosstab(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .stat.crosstab("o_orderstatus", "o_orderpriority")
      .orderBy(col("o_orderstatus_o_orderpriority"))

  /** Parquet schema evolution: batch 1 lands without `source`, batch 2
    * adds it; `mergeSchema` reads the union schema with nulls for the
    * missing column — how a 100 TB lake absorbs new fields without
    * rewriting history. Oracle reconstructs the same availability rule
    * from the original table. */
  def q105SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val zone = graft.Scratch.dir("q105_evolving")
    val d = Tables.documents(spark, dir)
    d.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "lang", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$zone/batch=1")
    d.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "lang", "n_chars", "source")
      .write.mode(SaveMode.Overwrite).parquet(s"$zone/batch=2")
    spark.read.option("mergeSchema", "true").parquet(zone)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("source")).as("n_with_source"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }

  /** Non-throwing arithmetic/casts: try_divide nulls the div-by-zero
    * rows, try_cast nulls unparseable strings — aggregates use
    * order-independent min/max/count so the result is float-stable. */
  def q106TryCast(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        expr("try_divide(o_totalprice, o_custkey % 3)").as("ratio"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_cast"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        count(col("ratio")).as("n_divisible"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"),
        count(col("bad_cast")).as("n_cast_ok"))
      .orderBy(col("o_orderstatus"))

  /** PII protection surface: `mask` redacts shape-preserving
    * (upper→X, lower→x, digit→n), `sha2` pseudonymizes (stable join
    * key without the value), and an AES encrypt→decrypt round trip
    * proves reversible encryption reconstructs the original —
    * oracle-checked against the ORIGINAL values, so any corruption in
    * the crypto cycle fails the hash. ECB mode only for determinism
    * of the demo; production uses the default GCM (random IV) where
    * ciphertext equality is intentionally impossible. */
  def q109DataMasking(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        expr("mask(c_name)").as("masked_name"),
        sha2(col("c_name"), 256).as("pseudonym"),
        expr("""CAST(aes_decrypt(
                  aes_encrypt(c_name, '0123456789abcdef', 'ECB'),
                  '0123456789abcdef', 'ECB') AS STRING)""")
          .as("roundtrip_name"))
      .orderBy(col("c_custkey"))

  /** Edit-distance fuzzy matching: nation-name pairs within
    * levenshtein distance 6 — the primitive behind typo-tolerant
    * entity resolution. All-pairs is fine on a dimension; at fact
    * scale the same predicate runs inside blocking buckets (cf. the
    * dedup operators' banding). */
  def q107Levenshtein(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.nation(spark, dir).select(col("n_name").as("name_a"))
    val b = Tables.nation(spark, dir).select(col("n_name").as("name_b"))
    a.join(b, col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 6)
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Scalable fuzzy join — the blocking-bucket upgrade q107's scaladoc
    * promises: customer-name pairs within levenshtein distance 1,
    * found WITHOUT an all-pairs comparison. Blocking is the symmetric
    * delete-1 scheme (SymSpell), escalated (r8) to the
    * POSITION-QUALIFIED key family the q239 scaladoc names as the
    * fat-block escape hatch. The plain scheme keys on the variant
    * STRING alone; under this generator's constant "Customer#000…"
    * prefix a single variant collects a corpus-fraction block
    * (population ~linear in n, candidate volume Σ C(p,2) quadratic —
    * the 12.7× ratio in the r7 stress sweep). Splitting the lev ≤ 1
    * relation by edit type makes every block absolutely bounded:
    *
    *  - SUBSTITUTION pairs (equal length, one differing position p):
    *    del_p(a) = del_p(b) — they share a delete-1 variant AT THE
    *    SAME POSITION. Keying on (variant, position) shrinks a block
    *    to "names agreeing everywhere but position i" — at most
    *    |alphabet| names, INDEPENDENT of n. (Identical names share
    *    every positional key, so dist-0 pairs are covered too.)
    *  - INDEL pairs (length differs by 1): the shorter name IS a
    *    delete-1 variant of the longer — an equi-join of the variant
    *    stream against the name column itself; block population =
    *    name multiplicity (~1 on real entity data).
    *
    * Both classes are recall-COMPLETE by the same argument as plain
    * SymSpell, so the result still EQUALS the all-pairs answer — the
    * oracle stays the naive n² definition. Candidate volume drops
    * from quadratic to O(n · len · |alphabet|); the r7 id-pair dedup
    * before the name join-back (the minhashPairs discipline) stays,
    * killing the collision-multiplicity term. Name join-backs carry
    * no broadcast hint (per-entity frames — the q284 rule; AQE
    * broadcasts at test SF). */
  /** the name itself + every delete-1 variant, deduped — the PLAIN
    * (unqualified) SymSpell key family. Kept for DedupSpec's
    * pathology probe (it asserts this family's fat block exists on
    * the fixture, i.e. that the positional escalation is load-
    * bearing); the production joins below use the positional family. */
  private[graft] val delete1VariantsSql =
    "array_distinct(concat(array(name), " +
      "transform(sequence(1, length(name)), " +
      "i -> concat(substring(name, 1, i - 1), " +
      "substring(name, i + 1, length(name))))))"

  /** POSITION-QUALIFIED delete-1 variants: (i, v) structs, one per
    * deleted position 1..len — the q230 substitution-class key
    * family, shared with q239's shift class and q299's health
    * report. No array_distinct: equal variants from different
    * positions are DIFFERENT keys now (that is the point). */
  private[graft] val delete1PosVariantsSql = """
    CASE WHEN length(name) >= 1 THEN
      transform(sequence(1, length(name)),
        i -> named_struct('i', i, 'v',
          concat(substring(name, 1, i - 1),
                 substring(name, i + 1, length(name)))))
    ELSE CAST(array() AS ARRAY<STRUCT<i: INT, v: STRING>>) END"""

  /** POSITION-QUALIFIED delete-2 variants: (i, j, v) for every
    * deleted position pair i < j (positions in the ORIGINAL string) —
    * q239's substitution-class key family. */
  private[graft] val delete2PosVariantsSql = """
    CASE WHEN length(name) >= 2 THEN
      flatten(transform(sequence(1, length(name) - 1),
        i -> transform(sequence(i + 1, length(name)),
          j -> named_struct('i', i, 'j', j, 'v',
            concat(substring(name, 1, i - 1),
                   substring(name, i + 1, j - i - 1),
                   substring(name, j + 1, length(name) - j))))))
    ELSE CAST(array() AS ARRAY<STRUCT<i: INT, j: INT, v: STRING>>) END"""

  /** Exact verify + canonical ordering shared by q230/q239: join the
    * deduped candidate id pairs back to names ONCE, keep pairs within
    * `maxDist`. */
  private def verifyPairs(c: DataFrame, cand: DataFrame,
      maxDist: Int): DataFrame =
    cand
      .join(c.select(col("id").as("id_a"), col("name").as("name_a")),
        "id_a")
      .join(c.select(col("id").as("id_b"), col("name").as("name_b")),
        "id_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))

  def q230FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    // key rows carry ONLY (id, i, k) — the r7 candidate discipline
    val k1 = c.select(col("id"),
        explode(expr(delete1PosVariantsSql)).as("kv"))
      .select(col("id"), col("kv.i").as("i"), col("kv.v").as("k"))
    // substitution class: same variant at the SAME position
    val subs = k1.as("a")
      .join(k1.as("b"),
        col("a.k") === col("b.k") && col("a.i") === col("b.i") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // indel class: one name IS a delete-1 variant of the other
    val byName = c.select(col("id").as("n_id"), col("name").as("k"))
    val indel = k1.join(byName, "k")
      .filter(col("id") =!= col("n_id"))
      .select(least(col("id"), col("n_id")).as("id_a"),
        greatest(col("id"), col("n_id")).as("id_b"))
    verifyPairs(c, subs.unionByName(indel).distinct(), maxDist = 1)
  }

  /** Delete-2 SymSpell tier — q230 at the distance real entity
    * resolution runs (dist ≤ 2).
    *
    * Input is the deterministic `c_custkey % 7 = 3` qualification
    * slice, and that is a finding, not a dodge: on this generator's
    * near-uniform names the dist≤2 RELATION is itself Θ(n²)-dense —
    * measured 4.08M matching pairs among 15k names at sf0.1, 3.6% of
    * ALL pairs — so no blocking scheme can be sub-quadratic when the
    * answer is quadratic. A production dist-2 tier over such a key
    * space is tuned (and its recall proven) on exactly this kind of
    * fixed slice before anyone pays for the dense full join; dist≤1,
    * whose relation is sparse, runs the full table in q230. */
  /** delete-≤2 variants of `name`: the name, every delete-1, and
    * delete-1 of every delete-1 (= delete-2), deduped (repeated
    * characters make identical deletions) — the PLAIN key family,
    * kept (like delete1VariantsSql) for DedupSpec's pathology probe:
    * under the constant "Customer#000…" prefix one of these keys
    * collects ~8-20% of all names (population ~linear in n,
    * candidate volume quadratic — the r7 stress sweep's only >10×
    * ratio), which is exactly what the positional family used by
    * q239 itself avoids. */
  private[graft] val delete2VariantsSql = """array_distinct(concat(
        array(name),
        transform(sequence(1, length(name)),
          i -> concat(substring(name, 1, i - 1),
                      substring(name, i + 1, length(name)))),
        flatten(transform(
          transform(sequence(1, length(name)),
            i -> concat(substring(name, 1, i - 1),
                        substring(name, i + 1, length(name)))),
          v -> transform(sequence(1, length(v)),
            k -> concat(substring(v, 1, k - 1),
                        substring(v, k + 1, length(v))))))))"""

  /** r8 escalation — the position-qualified key family, applied at
    * dist ≤ 2 by splitting the relation into edit-type classes, each
    * recall-complete for its class and each with absolutely bounded
    * blocks (the lev ≤ 2 edit scripts, by length difference):
    *
    *  - EQUAL LENGTH, ≤2 substitutions at positions p1 < p2:
    *    del_{p1,p2}(a) = del_{p1,p2}(b) — shared (variant, i, j) key
    *    at the SAME position pair. Block = names agreeing everywhere
    *    but positions (i, j): ≤ |alphabet|², independent of n.
    *  - EQUAL LENGTH, 1 delete + 1 insert (shift pairs, e.g.
    *    …012 / …120): deleting the moved char from each side leaves
    *    equal strings — shared delete-1 STRING at (generally)
    *    DIFFERENT positions, so this class joins the positional
    *    delete-1 stream on the string alone. Block = names equal to
    *    the variant plus one inserted char: ≤ len × |alphabet|
    *    pattern capacity, independent of n.
    *  - LENGTH DIFF 1: pure insert (lev 1) — the shorter name IS a
    *    delete-1 of the longer (names ⋈ delete-1); insert + sub
    *    (lev 2) — a delete-1 of the shorter equals a delete-2 of the
    *    longer (delete-1 ⋈ delete-2 on the string).
    *  - LENGTH DIFF 2: two inserts — the shorter name IS a delete-2
    *    of the longer (names ⋈ delete-2).
    *
    * The union of the five classes covers every lev ≤ 2 edit script,
    * so the result still EQUALS the all-pairs oracle. On equal-width
    * corpora (this generator) the three cross-length joins match
    * nothing — their streams carry different string lengths — and
    * cost only their exchanges; the work lives in the two bounded
    * equal-length classes. Measured: the r7 unqualified family was
    * the stress sweep's only >10× ratio (fat blocks under the
    * constant prefix); this family's blocks cap at the alphabet
    * bound, making candidate volume O(n · len²) with constants set
    * by |alphabet|, not by n. */
  def q239FuzzyJoinD2(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    verifyPairs(c, fuzzyCandidatesD2(c), maxDist = 2)
  }

  /** q239's deduped candidate id pairs — the five-class positional
    * blocking union. Split out so DedupSpec can pin the
    * candidate:result ratio (the verify-work budget) directly on the
    * stream the join actually pays for. */
  private[graft] def fuzzyCandidatesD2(c: DataFrame): DataFrame = {
    val k0 = c.select(col("id").as("n_id"), col("name").as("k"))
    val k1 = c.select(col("id"),
        explode(expr(delete1PosVariantsSql)).as("kv"))
      .select(col("id"), col("kv.i").as("i"), col("kv.v").as("k"))
    val k2 = c.select(col("id"),
        explode(expr(delete2PosVariantsSql)).as("kv"))
      .select(col("id"), col("kv.i").as("i"), col("kv.j").as("j"),
        col("kv.v").as("k"))
    def lg(a: Column, b: Column) =
      Seq(least(a, b).as("id_a"), greatest(a, b).as("id_b"))
    // substitutions: same delete-2 variant at the SAME position pair
    val subs = k2.as("a")
      .join(k2.as("b"),
        col("a.k") === col("b.k") && col("a.i") === col("b.i") &&
          col("a.j") === col("b.j") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // equal-length shift pairs: shared delete-1 string, any positions
    val shifts = k1.as("a")
      .join(k1.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // cross-length classes (string-keyed; empty on equal-width data)
    val ins1 = k1.join(k0, "k").filter(col("id") =!= col("n_id"))
      .select(lg(col("id"), col("n_id")): _*)
    val ins2 = k2.join(k0, "k").filter(col("id") =!= col("n_id"))
      .select(lg(col("id"), col("n_id")): _*)
    val insSub = k1.as("a")
      .join(k2.as("b"), col("a.k") === col("b.k") &&
        col("a.id") =!= col("b.id"))
      .select(lg(col("a.id"), col("b.id")): _*)
    subs.unionByName(shifts).unionByName(ins1)
      .unionByName(ins2).unionByName(insSub).distinct()
  }

  /** q299: blocking-health report for the fuzzy tier — block
    * population and candidate volume are the entity-resolution job's
    * health metrics; DedupSpec pins them at test scale; this
    * publishes them as a CATALOG ARTIFACT, the way the sketch tiers
    * publish error certificates (q234/q245/…): per block-population
    * bucket over the key space q230 actually joins on — the
    * POSITION-QUALIFIED delete-1 family (r8; keys are
    * "pos:variant") — how many blocks exist, how many key rows they
    * hold, and how many candidate pairs (Σ C(p,2)) they would feed
    * the verify. The r7 report over the UNQUALIFIED family measured
    * the pathology this family removes (a 17+ bucket carrying
    * corpus-fraction blocks); with positional keys every block is
    * capped by the alphabet, so a 17+ bucket REAPPEARING in this
    * histogram means the data outgrew the alphabet bound — the
    * production signal to escalate again (prefix-qualified keys)
    * BEFORE the verify bill arrives. The indel class (name ⋈
    * variant) needs no histogram: its block population is name
    * multiplicity, ~1 on real entity data.
    *
    * Scale shape: one explode + one (key) aggregate + one 6-row
    * bucket aggregate — strictly cheaper than the join it guards
    * (the whole point of a health probe). All counts exact integers;
    * bucket boundaries are powers of two. */
  def q299BlockHealth(spark: SparkSession, dir: String): DataFrame = {
    val p = col("p")
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
      .select(col("id"), explode(expr(delete1PosVariantsSql)).as("kv"))
      .select(concat(col("kv.i").cast("string"), lit(":"), col("kv.v"))
        .as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("p"))
      .withColumn("bucket_rank",
        when(p <= 1, 1).when(p <= 2, 2).when(p <= 4, 3)
          .when(p <= 8, 4).when(p <= 16, 5).otherwise(6))
      .withColumn("bucket",
        when(p <= 1, "1").when(p <= 2, "2").when(p <= 4, "3-4")
          .when(p <= 8, "5-8").when(p <= 16, "9-16").otherwise("17+"))
      .groupBy(col("bucket_rank"), col("bucket"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(p).as("n_key_rows"),
        sum(expr("p * (p - 1) div 2")).as("n_cand_pairs"))
      .orderBy(col("bucket_rank"))
  }

  /** PII detection report — the scan an LLM corpus runs before the
    * redaction pass (q109 is the redaction side). The synthetic corpus
    * carries no PII, so a deterministic fraction of docs first gets an
    * email + phone appended (doc_id-derived, so the oracle re-derives
    * the same corpus); the regex battery then counts per-source hits.
    * All narrow codegen'd regex expressions in one scan pass + one
    * tiny aggregation — scales with corpus bytes. */
  private[graft] val emailRe = "[a-z0-9]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val phoneRe = "\\+1-555-[0-9]{4}"

  /** The deterministic PII-injected corpus q180/q227 share: every 7th
    * doc gets a doc_id-derived email + phone appended, so the DuckDB
    * oracle re-derives the identical text. */
  private[graft] def piiInjected: org.apache.spark.sql.Column =
    when(col("doc_id") % 7 === 0,
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text"))

  def q180PiiScan(spark: SparkSession, dir: String): DataFrame = {
    val injected = piiInjected
    Tables.documents(spark, dir)
      .select(col("source"), injected.as("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("t").rlike(emailRe)).as("docs_with_email"),
        sum(regexp_count(col("t"), lit(emailRe))).as("n_emails"),
        sum(regexp_count(col("t"), lit(phoneRe))).as("n_phones"),
        min(regexp_substr(col("t"), lit(emailRe))).as("sample_email"))
      .orderBy(col("source"))
  }

  /** Chi-squared independence report for `lang` x `source` — the
    * corpus-composition drift test a curation pipeline runs per
    * snapshot: are languages distributed across sources the way the
    * last snapshot said, or did one crawl source suddenly skew?
    * Emits one row per contingency cell with observed count, expected
    * count under independence, and the cell's chi-squared term; an
    * analyst (or q220's drift monitor) sums the terms against the
    * critical value for (R-1)(C-1) degrees of freedom.
    *
    * Scale shape: ONE corpus-wide aggregate (groupBy lang,source);
    * both marginals and the grand total re-aggregate the cell table,
    * which has |langs| x |sources| rows — metadata-sized at any corpus
    * size — so the three joins that attach them are broadcasts by
    * construction, never a second corpus scan. All arithmetic stays on
    * exact BIGINT counts until the final double division, so the report
    * is bitwise-deterministic across engines and partitionings. */
  def q221Chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy(col("lang"))
      .agg(sum(col("observed")).as("row_total"))
    val colTot = cells.groupBy(col("source"))
      .agg(sum(col("observed")).as("col_total"))
    val grand = cells.agg(sum(col("observed")).as("n"))
    val expected =
      (col("row_total").cast("double") * col("col_total").cast("double")) /
        col("n").cast("double")
    cells
      .join(broadcast(rowTot), "lang")
      .join(broadcast(colTot), "source")
      .crossJoin(broadcast(grand))
      .select(col("lang"), col("source"), col("observed"),
        col("row_total"), col("col_total"),
        expected.as("expected"),
        ((col("observed").cast("double") - expected) *
          (col("observed").cast("double") - expected) / expected)
          .as("chi2_term"))
      .orderBy(col("lang"), col("source"))
  }

  /** PII redaction APPLIED — q180 is the scan, this is the production
    * pass that ships: emails and phones replaced with typed
    * placeholder tokens over the same injected corpus, certified per
    * source by (a) an order-free corpus checksum — the SUM of each
    * redacted doc's 48-bit md5 prefix, so the oracle must reproduce
    * every redacted byte exactly, in any row order — and (b) a
    * residual-PII recount over the redacted text, which the spec pins
    * to zero (the redaction's own acceptance test).
    *
    * Scale shape: pure narrow codegen'd regex expressions in ONE scan
    * pass + one tiny per-source aggregate — no shuffle beyond the
    * |sources|-row agg exchange; identical cost profile to q180. The
    * full redacted corpus would normally be the written output (q21's
    * parquet sink); the report here is the part with oracle value. */
  def q227PiiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val raw = piiInjected
    val redacted = regexp_replace(
      regexp_replace(raw, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
    Tables.documents(spark, dir)
      .select(col("source"), raw.as("t"), redacted.as("r"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("t") =!= col("r")).as("docs_redacted"),
        sum(regexp_count(col("t"), lit(emailRe))).as("emails_redacted"),
        sum(regexp_count(col("t"), lit(phoneRe))).as("phones_redacted"),
        sum(conv(substring(md5(col("r")), 1, 12), 16, 10).cast("long"))
          .as("corpus_checksum"),
        count_if(col("r").rlike(emailRe) || col("r").rlike(phoneRe))
          .as("residual_pii"))
      .orderBy(col("source"))
  }

  /** q258: source × gate attrition matrix — "which sources die at
    * which gate": for every source, how many documents pass each
    * independent curation gate (token length in [20,2000], digit
    * ratio ≤ 0.2, mean word length in [2,12], PII-injected) and how
    * many survive all of them. q193's waterfall answers "which GATE
    * costs the most overall"; this answers the provenance question a
    * crawl team actually asks — which upstream feed is junk — and is
    * the report that decides source-level contracts. One narrow
    * feature map (every gate is a string/arith expression inside
    * codegen, no explode), one source-keyed aggregate with map-side
    * partials. */
  def q258SourceGates(spark: SparkSession, dir: String): DataFrame = {
    val norm = normText(col("text"))
    val nTok = size(split(norm, " "))
    val feat = Tables.documents(spark, dir).select(col("source"),
      nTok.as("n_tok"),
      (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        length(col("text")).cast("double")).as("digit_ratio"),
      ((length(norm) - (nTok - 1)).cast("double") /
        nTok.cast("double")).as("mean_wl"),
      (col("doc_id") % 7 === 0).as("pii"))
    feat.select(col("source"),
        (col("n_tok") >= 20 && col("n_tok") <= 2000).as("len_ok"),
        (col("digit_ratio") <= 0.2d).as("digit_ok"),
        (col("mean_wl") >= 2.0d && col("mean_wl") <= 12.0d).as("wl_ok"),
        col("pii"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("len_ok")).as("n_len_ok"),
        count_if(col("digit_ok")).as("n_digit_ok"),
        count_if(col("wl_ok")).as("n_wl_ok"),
        count_if(col("pii")).as("n_pii"),
        count_if(col("len_ok") && col("digit_ok") && col("wl_ok") &&
          !col("pii")).as("n_pass"))
      .orderBy(col("source"))
  }

  /** q262: per-source score-drift — a discrete two-sample
    * Kolmogorov–Smirnov statistic between each source's classifier-
    * score distribution and the pooled corpus, evaluated on the
    * corpus's own ventile grid. The continuous KS needs a global
    * sort; the grid form is the scale-honest version — and because
    * the grid is the pooled distribution's OWN quantiles, it has
    * maximal resolution exactly where the mass is. A drifting feed
    * (format change, spam influx, encoding bug) shows up as its KS
    * detaching from the pack long before mean-level metrics move.
    *
    * Shape: one scoring pass; the 19 thresholds are ONE exact-
    * percentile aggregate collected driver-side (19 doubles — model
    * state, the q248 discipline) and inlined, so bin assignment is a
    * narrow map (`size(filter(...))`, no per-row join, no 19×
    * explode); everything after runs on the (source × bin) table —
    * a few hundred rows at any corpus size. */
  /** q265: k-anonymity audit over quasi-identifiers — the re-
    * identification risk report a data-release (or training-data
    * compliance) review runs before publishing row-level records.
    * Quasi-identifier = (market segment, nation, account-balance
    * band): every combination is an equivalence class; a row in a
    * class of size s is re-identifiable among s candidates. The
    * report is the class-size histogram (one row per observed size:
    * how many classes, how many rows, whether below the k=5 release
    * threshold) — `min(class_size)` IS the dataset's k-anonymity.
    *
    * The balance band is a FIXED-WIDTH floor(bal/1000) map, not a
    * corpus ntile: a quantile band would need a global sort and —
    * worse — would make each row's class depend on every other row,
    * so shards could not be audited independently. Fixed bands keep
    * the audit shard-composable: per-shard class counts sum to the
    * global ones.
    *
    * Scale shape: two aggregates — QI group-by (map-side partial,
    * class cardinality bounded by the QI domain, not the row count)
    * then a histogram group-by over the class table. The corpus is
    * touched once. */
  def q265KAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0d).cast("long").as("bal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        (count(lit(1)) * col("class_size")).as("n_rows"))
      .withColumn("at_risk", col("class_size") < 5L)
      .orderBy(col("class_size"))

  /** q268: robust outlier report per source — median/MAD in place of
    * mean/stddev, so a handful of extreme documents cannot drag the
    * very threshold that is supposed to catch them (the classic
    * failure of z-score gating on heavy-tailed quality scores). A doc
    * is an outlier when |score − median| > 3·1.4826·MAD (1.4826
    * scales MAD to σ under normality, so "3" keeps its familiar
    * meaning).
    *
    * Scale shape: per-SOURCE exact percentiles — the group key bounds
    * the sort width, there is no corpus-global percentile anywhere
    * (at 100 TB the exact per-group percentile becomes the GK sketch
    * of q129; the report shape is unchanged). Two corpus passes
    * (score → deviation) with the per-source median attached back as
    * a broadcast of a |sources|-row frame; every per-row term rounds
    * to 9 decimals before comparison so the flag is engine-portable. */
  def q268MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val s = TextStats.hashedScores(spark, dir)
      .select(col("source"), col("score"))
    val med = s.groupBy(col("source"))
      .agg(round(expr("percentile(score, 0.5d)"), 9).as("med"))
    val dev = s.join(broadcast(med), Seq("source"))
      .select(col("source"), col("med"),
        round(abs(col("score") - col("med")), 9).as("dev"))
    val mad = dev.groupBy(col("source"))
      .agg(round(expr("percentile(dev, 0.5d)"), 9).as("mad"))
    dev.join(broadcast(mad), Seq("source"))
      .groupBy(col("source"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dev") > round(col("mad") * 4.4478d, 9), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("source"), col("n_docs"), col("med"), col("mad"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") /
          col("n_docs").cast("double"), 9).as("outlier_rate"))
      .orderBy(col("source"))
  }

  /** q276: Fellegi–Sunter linkage weights — the scoring model layer
    * above the fuzzy joins (q230/q239). For each comparison field
    * (nation, market segment, balance band) estimate m = P(agree |
    * match) from the labeled match pairs (q230's delete-1 join, which
    * EQUALS the all-pairs dist≤1 relation) and u = P(agree |
    * non-match) from a deterministic non-match sample (adjacent
    * custkey pairs, anti-joined against the match relation so no true
    * match contaminates it). The agreement weight log2(m/u) is what a
    * production linker sums per field to score a candidate pair;
    * add-one smoothing keeps both probabilities off 0/1 so the log is
    * always finite and the report deterministic.
    *
    * Scale shape: the match relation comes from the blocked join (no
    * all-pairs anywhere); both pair sets reduce in ONE aggregate each
    * (three boolean-sum columns); the field unpivot and the weight
    * arithmetic run on two 1-row frames. Counts stay integers until
    * the smoothed divisions, which consume already-rounded inputs.
    * The attribute join-backs carry NO broadcast hint: `side()` is one
    * row per entity — unbounded at corpus scale (the q284 rule) — so
    * AQE picks the join strategy; the pair sets are the small side
    * when anything is. */
  def q276LinkageWeights(spark: SparkSession, dir: String): DataFrame = {
    val attrs = Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_nationkey").as("nat"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000.0d).cast("long").as("band"))
    def side(s: String): DataFrame = attrs.select(col("id").as(s"id_$s"),
      col("nat").as(s"nat_$s"), col("seg").as(s"seg_$s"),
      col("band").as(s"band_$s"))
    def agreeCounts(pairs: DataFrame, p: String): DataFrame = pairs
      .join(side("a"), Seq("id_a"))
      .join(side("b"), Seq("id_b"))
      .agg(count(lit(1)).as(s"n_$p"),
        sum(when(col("nat_a") === col("nat_b"), 1L).otherwise(0L))
          .as(s"nat_$p"),
        sum(when(col("seg_a") === col("seg_b"), 1L).otherwise(0L))
          .as(s"seg_$p"),
        sum(when(col("band_a") === col("band_b"), 1L).otherwise(0L))
          .as(s"band_$p"))
    val matches = q230FuzzyJoin(spark, dir).select(col("id_a"), col("id_b"))
      .localCheckpoint(eager = false)
    val nonmatches = attrs.select(col("id").as("id_a"))
      .join(attrs.select(col("id").as("id_b")),
        col("id_b") === col("id_a") + 1L)
      .join(matches, Seq("id_a", "id_b"), "left_anti")
    agreeCounts(matches, "m").crossJoin(agreeCounts(nonmatches, "u"))
      .select(explode(array(
          struct(lit("bal_band").as("field"), col("band_m").as("agree_m"),
            col("band_u").as("agree_u")),
          struct(lit("nation").as("field"), col("nat_m").as("agree_m"),
            col("nat_u").as("agree_u")),
          struct(lit("segment").as("field"), col("seg_m").as("agree_m"),
            col("seg_u").as("agree_u")))).as("f"),
        col("n_m"), col("n_u"))
      .select(col("f.field").as("field"),
        col("n_m").as("n_match_pairs"), col("f.agree_m").as("agree_match"),
        col("n_u").as("n_nonmatch_pairs"),
        col("f.agree_u").as("agree_nonmatch"))
      .withColumn("m_prob",
        round((col("agree_match") + 1L).cast("double") /
          (col("n_match_pairs") + 2L).cast("double"), 9))
      .withColumn("u_prob",
        round((col("agree_nonmatch") + 1L).cast("double") /
          (col("n_nonmatch_pairs") + 2L).cast("double"), 9))
      .withColumn("weight", round(log2(col("m_prob") / col("u_prob")), 9))
      .orderBy(col("field"))
  }

  /** q282: delete-one-shard jackknife standard error of the mean
    * quality score per source — the uncertainty a monitoring report
    * should attach before anyone reacts to a mean shifting (q262/q268
    * flag distribution changes; this says how much wobble the mean
    * itself carries). The corpus is split into g=16 deterministic
    * hash shards; each delete-one-shard mean m_j is computed from the
    * complement, and SE² = (g−1)/g · Σ_j (m_j − m̄)² — the grouped
    * jackknife, the resampling scheme that needs NO replication of
    * the data (a bootstrap would explode the corpus ×B).
    *
    * Scale shape: ONE corpus aggregate to (source, shard) — 16 rows
    * per source — and everything after runs on that metadata frame.
    * Score sums stay DECIMAL(28,9)-exact; each m_j and each squared
    * deviation rounds to 9 before the decimal sum, so the SE is
    * engine-portable; sqrt of identical doubles is bitwise identical. */
  def q282JackknifeSe(spark: SparkSession, dir: String): DataFrame = {
    val s = TextStats.hashedScores(spark, dir)
      .select(col("source"), col("doc_id"), col("score"))
    // md5-keyed shard, not doc_id % 16: doc ids are assigned round-
    // robin by source in this corpus, so a modulus shard would
    // correlate with the grouping key and collapse g
    val shard = s.withColumn("j",
      pmod(conv(substring(md5(concat(lit("jk"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"),
        lit(16L)))
      .groupBy(col("source"), col("j"))
      .agg(count(lit(1)).as("nj"),
        sum(col("score").cast("decimal(28,9)")).as("sj"))
    val tot = shard.groupBy(col("source"))
      .agg(sum(col("nj")).as("n"), sum(col("sj")).as("stot"),
        count(lit(1)).as("g"))
      .filter(col("g") >= 2)
    val mj = shard.join(broadcast(tot), Seq("source"))
      .select(col("source"), col("g"), col("n"), col("stot"),
        round((col("stot") - col("sj")).cast("double") /
          (col("n") - col("nj")).cast("double"), 9).as("mj"))
    val mb = mj.groupBy(col("source"))
      .agg(round(sum(col("mj").cast("decimal(28,9)")).cast("double") /
        count(lit(1)).cast("double"), 9).as("mbar"))
    mj.join(broadcast(mb), Seq("source"))
      .select(col("source"), col("g"), col("n"), col("stot"),
        round((col("mj") - col("mbar")) * (col("mj") - col("mbar")), 9)
          .cast("decimal(28,9)").as("d2"))
      .groupBy(col("source"), col("g"), col("n"), col("stot"))
      .agg(sum(col("d2")).as("ssd"))
      .select(col("source"), col("n").as("n_docs"),
        col("g").as("n_shards"),
        round(col("stot").cast("double") / col("n").cast("double"), 9)
          .as("mean_score"),
        round(sqrt((col("g") - 1L).cast("double") /
          col("g").cast("double") * col("ssd").cast("double")), 9)
          .as("se_jack"))
      .orderBy(col("source"))
  }

  /** q266: l-diversity audit — the companion check to q265's
    * k-anonymity. A class can be large (k-anonymous) yet still leak:
    * if every row in it shares the same SENSITIVE value, membership
    * alone reveals the attribute. Here the quasi-identifier is
    * (nation, balance band) and the sensitive attribute is the market
    * segment; l = distinct sensitive values per class, and the report
    * is the l-histogram (classes, rows, at-risk below l=3).
    *
    * Scale shape: distinct-inside-group is computed as TWO stacked
    * group-bys — collapse to (QI, sensitive) first (map-side partial
    * agg on a domain-bounded key), then count rows per QI — instead
    * of `countDistinct`, whose Expand doubles the shuffled rows. Same
    * fixed-width band discipline as q265 keeps the audit
    * shard-composable. */
  def q266LDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0d).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .groupBy(col("c_nationkey"), col("bal_band"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("l_div"), sum(col("n")).as("class_size"))
      .groupBy(col("l_div"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("at_risk", col("l_div") < 3L)
      .orderBy(col("l_div"))

  /** q269: applied robust winsorization — q268 REPORTS the outliers;
    * this query applies the repair a score-consuming pipeline actually
    * ships: clip every score into [median − 3σ̂, median + 3σ̂] per
    * source (σ̂ = 1.4826·MAD, q268's robust scale), and certify the
    * result — `n_residual` counts clipped values that still sit
    * outside the band and the oracle pins it to zero, so the
    * certificate is hash-checked, not eyeballed. `mass_moved` (the
    * total score mass the clip displaced) is the number a reviewer
    * compares against the corpus size before trusting downstream
    * means.
    *
    * Scale shape: identical to q268 — per-source exact percentiles
    * (group-bounded sort width), medians/MADs attached back as
    * broadcast metadata frames, one final corpus aggregate. Every
    * per-row term rounds to 9 decimals before comparison and the
    * displaced mass sums as DECIMAL(28,9), so the report is
    * engine-portable. */
  def q269RobustClip(spark: SparkSession, dir: String): DataFrame = {
    val s = TextStats.hashedScores(spark, dir)
      .select(col("source"), col("score"))
    val med = s.groupBy(col("source"))
      .agg(round(expr("percentile(score, 0.5d)"), 9).as("med"))
    val dev = s.join(broadcast(med), Seq("source"))
      .select(col("source"), col("med"), col("score"),
        round(abs(col("score") - col("med")), 9).as("dev"))
    val mad = dev.groupBy(col("source"))
      .agg(round(expr("percentile(dev, 0.5d)"), 9).as("mad"))
    val halfwidth = round(col("mad") * 4.4478d, 9)
    val lo = round(col("med") - halfwidth, 9)
    val hi = round(col("med") + halfwidth, 9)
    val clipped = least(greatest(col("score"), lo), hi)
    dev.join(broadcast(mad), Seq("source"))
      .select(col("source"), col("med"), col("mad"), col("score"),
        halfwidth.as("hw"), lo.as("lo"), hi.as("hi"),
        clipped.as("clipped"))
      .groupBy(col("source"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") < col("lo"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col("score") > col("hi"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        round(sum(round(abs(col("score") - col("clipped")), 9)
          .cast("decimal(28,9)")).cast("double"), 9).as("mass_moved"),
        sum(when(round(abs(col("clipped") - col("med")), 9) > col("hw"),
          1L).otherwise(0L)).as("n_residual"))
      .select(col("source"), col("n_docs"), col("med"), col("mad"),
        col("n_clipped_lo"), col("n_clipped_hi"), col("mass_moved"),
        col("n_residual"))
      .orderBy(col("source"))
  }

  /** q271: 2-D Pareto skyline per language — the documents no other
    * document (same lang) beats on BOTH axes (token count ↑, quality
    * score ↑, weak inequality with at least one strict). This is the
    * classic skyline operator Spark has no primitive for, composed
    * from range-frame windows: a point survives iff no strictly-longer
    * doc has score ≥ its own (`max(score)` over the range frame
    * n_tokens+1..∞) and no equal-length doc has a strictly higher
    * score (`max(score)` over the equal-length partition).
    *
    * Scale design — two-level pruning: the first pass computes the
    * skyline WITHIN (lang, 64-token band); since dominance within a
    * band implies dominance globally, dropping band-dominated rows is
    * safe, and the per-band window bounds the sort width (no giant
    * per-lang sort over the corpus). The second pass runs the same
    * filter per lang over the band survivors — at most a few points
    * per band — so the global window touches a bands-sized frame.
    * Both passes are exact; the composition equals the one-pass
    * skyline, which is what the oracle computes. */
  def q271Skyline(spark: SparkSession, dir: String): DataFrame = {
    def skyline(df: DataFrame, part: Seq[String]): DataFrame = {
      val pcols = part.map(col)
      val wGt = Window.partitionBy(pcols: _*).orderBy(col("n_tokens"))
        .rangeBetween(1L, Window.unboundedFollowing)
      val wEq = Window.partitionBy((part :+ "n_tokens").map(col): _*)
      df.withColumn("my_gt", max(col("score")).over(wGt))
        .withColumn("my_eq", max(col("score")).over(wEq))
        .filter((col("my_gt").isNull || col("my_gt") < col("score")) &&
          col("my_eq") === col("score"))
        .drop("my_gt", "my_eq")
    }
    val s = TextStats.hashedScores(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"))
    val local = skyline(
      s.withColumn("band", (col("n_tokens") / lit(64L)).cast("long")),
      Seq("lang", "band")).drop("band")
    skyline(local, Seq("lang"))
      .orderBy(col("lang"), col("n_tokens").desc, col("doc_id"))
  }

  def q262ScoreDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = TextStats.hashedScores(spark, dir)
      .select(col("source"), col("score"))
    val qs = (1 to 19).map(_ / 20.0d)
    val thrSeq = s
      .agg(expr(s"percentile(score, array(${qs.mkString(", ")}))")
        .as("g"))
      .select(expr("transform(g, q -> round(q, 9))").as("g"))
      .collect()(0).getSeq[Double](0).toIndexedSeq
    val thr = typedlit(thrSeq)
    val sb = s
      .withColumn("bin", size(filter(thr, t => col("score") > t)))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("n"))
    val grid = (1 to 19).toDF("j")
    val srcN = sb.groupBy(col("source")).agg(sum(col("n")).as("n_src"))
    val f = sb.crossJoin(broadcast(grid))
      .groupBy(col("source"), col("j"))
      .agg(sum(when(col("bin") < col("j"), col("n")).otherwise(0L))
        .as("c"))
    val fc = sb.crossJoin(broadcast(grid))
      .groupBy(col("j"))
      .agg(sum(when(col("bin") < col("j"), col("n")).otherwise(0L))
        .as("cc"), sum(col("n")).as("nc_part"))
    val nc = sb.agg(sum(col("n")).as("nc"))
    val d = f.join(broadcast(fc.select(col("j"), col("cc"))), Seq("j"))
      .join(broadcast(srcN), Seq("source"))
      .crossJoin(broadcast(nc))
      .select(col("source"), col("j"),
        round(abs(col("c").cast("double") / col("n_src").cast("double") -
          col("cc").cast("double") / col("nc").cast("double")), 9)
          .as("diff"))
    d.groupBy(col("source"))
      .agg(max(col("diff")).as("ks"),
        max(struct(col("diff"), (-col("j")).as("nj"))).as("best"))
      .select(col("source"), col("ks"),
        (-col("best.nj")).cast("int").as("worst_j"))
      .orderBy(col("source"))
  }
}
