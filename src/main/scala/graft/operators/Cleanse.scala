package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Reference-parity cleanse operators (SURVEY.md §2A, O4–O20).
  *
  * Semantics follow the reference pipeline at
  * `/root/reference/etl/transform.py` exactly; the implementation is
  * Spark-native Catalyst expressions throughout — in particular the
  * reference's Python UDF (`transform.py:73-83`) becomes a higher-order
  * function chain, so the whole cleanse stays inside whole-stage codegen
  * with no optimization barrier and no per-row (de)serialization.
  * At 100 TB every operator here is a narrow transform: zero shuffles,
  * scan-bound, trivially partition-parallel.
  */
object Cleanse {

  /** Europe standardization table (reference `transform.py:41-71`). */
  val EuropeStd: Map[String, String] = Map(
    "United Kingdom" -> "United Kingdom",
    "England"        -> "United Kingdom",
    "Scotland"       -> "United Kingdom",
    "Wales"          -> "United Kingdom",
    "Ireland"        -> "Ireland",
    "Spain"          -> "Spain",
    "France"         -> "France",
    "Germany"        -> "Germany",
    "West Germany"   -> "Germany",
    "Italy"          -> "Italy",
    "Portugal"       -> "Portugal",
    "Netherlands"    -> "Netherlands",
    "Belgium"        -> "Belgium",
    "Sweden"         -> "Sweden",
    "Norway"         -> "Norway",
    "Denmark"        -> "Denmark",
    "Finland"        -> "Finland",
    "Poland"         -> "Poland",
    "Czech Republic" -> "Czech Republic",
    "Austria"        -> "Austria",
    "Switzerland"    -> "Switzerland",
    "Luxembourg"     -> "Luxembourg",
    "Russia"         -> "Russia",
    "Ukraine"        -> "Ukraine",
    "Belarus"        -> "Belarus",
    "Turkey"         -> "Turkey",
    "Greece"         -> "Greece",
    "Cyprus"         -> "Cyprus",
    "Iceland"        -> "Iceland",
  )

  /** Rating whitelist (reference `transform.py:108-112`). */
  val ValidRatings: Seq[String] = Seq(
    "TV-G", "TV-Y", "TV-Y7", "TV-Y7-FV", "TV-PG", "TV-14", "TV-MA",
    "G", "PG", "PG-13", "R", "NC-17", "NR")

  /** Rating → Spanish meaning (reference `transform.py:121-137`). */
  val RatingMeaning: Seq[(String, String)] = Seq(
    "TV-G"     -> "Todo público",
    "TV-Y"     -> "Niños pequeños",
    "TV-Y7"    -> "Mayores de 7 años",
    "TV-Y7-FV" -> "7+ con violencia fantasiosa",
    "TV-PG"    -> "Guía parental recomendada",
    "TV-14"    -> "Mayores de 14 años",
    "TV-MA"    -> "Solo adultos",
    "G"        -> "Todo público",
    "PG"       -> "Guía parental",
    "PG-13"    -> "Mayores de 13 años",
    "R"        -> "Restringido +17",
    "NC-17"    -> "Solo adultos (estricto)",
    "NR"       -> "No clasificado")

  /** Genre LIKE-pattern → bucket, first-match-wins, including the
    * reference's Horror/Action→Crime and Reality→Documental quirks
    * (reference `transform.py:149-164`). */
  val GenreBuckets: Seq[(String, String)] = Seq(
    "%Kids%"     -> "Kids",
    "%Anime%"    -> "Anime",
    "%Crime%"    -> "Crime",
    "%Horror%"   -> "Crime",
    "%Action%"   -> "Crime",
    "%Drama%"    -> "Drama",
    "%Romantic%" -> "Drama",
    "%Classic%"  -> "Drama",
    "%Comedy%"   -> "Comedy",
    "%Stand-Up%" -> "Comedy",
    "%Reality%"  -> "Documental",
    "%Docu%"     -> "Documental")

  /** First-European-country standardization — the native rewrite of the
    * reference's Python UDF (`transform.py:73-83`), preserving its exact
    * semantics: strip `"` chars, split on `,`, trim each part, drop
    * empties, return the standardized name of the FIRST part (in
    * appearance order) found in [[EuropeStd]]; null when no match or
    * null/empty input. Pure Catalyst higher-order functions: no UDF, no
    * codegen barrier, and filters can still push below it. */
  def europeCountry(c: Column): Column = {
    val dict = typedLit(EuropeStd)
    val parts = filter(
      transform(split(regexp_replace(c, "\"", ""), ","), p => trim(p)),
      p => p =!= "")
    val firstHit = try_element_at(filter(parts, p => map_contains_key(dict, p)), lit(1))
    try_element_at(dict, firstHit)
  }

  /** The full reference cleanse pipeline (O4–O20) over the 12-column
    * netflix_titles shape; input columns per FIXTURES.md §1.
    * Output schema: show_id, title, country, release_year:int, rating,
    * rating_meaning, main_genre, genre_group (`transform.py:188-197`). */
  def cleanseTitles(raw: DataFrame): DataFrame = {
    // O4 filter; O5 split+index (`transform.py:27,32-35`)
    val base = raw
      .filter(col("type") === "TV Show")
      .withColumn("main_genre", split(col("listed_in"), ",").getItem(0))
      // O6 quote-strip + trim; O7 native standardization; O8 null filter
      .withColumn("country", trim(regexp_replace(col("country"), "\"", "")))
      .withColumn("country_eu", europeCountry(col("country")))
      .filter(col("country_eu").isNotNull)
      // O9-O11 digit-clean → non-empty → cast (`transform.py:97-103`)
      .withColumn("release_year",
        regexp_replace(col("release_year").cast("string"), "[^0-9]", ""))
      .filter(col("release_year") =!= "")
      .withColumn("release_year", expr("try_cast(release_year AS INT)"))

    // O12 whitelist; O13 decode chain; O14 defensive re-guard
    val rated = base
      .withColumn("rating_clean",
        when(col("rating").isin(ValidRatings: _*), col("rating"))
          .otherwise(lit("UNKNOWN")))
      .withColumn("rating_meaning",
        RatingMeaning.foldLeft(lit("Desconocido")) { case (acc, (k, v)) =>
          when(col("rating_clean") === k, v).otherwise(acc)
        })
      .withColumn("rating_meaning",
        when(col("rating_clean").isin(ValidRatings: _*), col("rating_meaning"))
          .otherwise(lit("Desconocido")))
      // O15 LIKE-chain bucketing, first-match-wins (fold in reverse so the
      // earliest pattern in GenreBuckets wins, as in the reference chain)
      .withColumn("genre_group",
        GenreBuckets.reverse.foldLeft(lit("Other")) { case (acc, (pat, v)) =>
          when(col("main_genre").like(pat), v).otherwise(acc)
        })

    // O16 bulk quote-strip; O17 CSV-safety comma rewrite; O18 trims.
    // Two withColumns batches (not one withColumn per column): each
    // batch is a single Project node, so the analyzer sees 2 nodes
    // instead of 9 — SURVEY.md §4's own guidance. Composition order is
    // preserved: quote-strip, then comma-rewrite, then trim.
    val quoteStripped = Seq("title", "country", "country_eu",
      "main_genre", "rating_meaning")
    val cleaned = rated
      .withColumns(quoteStripped.map(c =>
        c -> regexp_replace(col(c), "\"", "")).toMap)
      .withColumns(Map(
        "title" -> trim(regexp_replace(col("title"), ",", " -")),
        "rating_meaning" -> trim(col("rating_meaning")),
        "main_genre" -> trim(col("main_genre")),
        "country_eu" -> trim(col("country_eu"))))

    // O19 projection/rename; O20 mis-aligned-row repair filter
    cleaned.select(
      col("show_id"), col("title"),
      col("country_eu").as("country"), col("release_year"),
      col("rating_clean").as("rating"), col("rating_meaning"),
      col("main_genre"), col("genre_group"))
      .filter(!col("rating_meaning").isin("TV-MA", "TV-G", "2020"))
  }

  // ---- testdata-mapped catalog queries (oracle-checked) ----

  /** Exercises the O6–O8 country-standardization path on testdata:
    * a dirty multi-country string is synthesized per customer row
    * (covering multi-country order, quoted alias, non-European,
    * empty, and padded-alias cases), then standardized natively. */
  def qCleanseCountry(spark: SparkSession, dir: String): DataFrame = {
    val dirty = element_at(
      array(lit("France, United Kingdom"), lit("\"England\""), lit("Peru"),
            lit(""), lit(" West Germany , Spain ")),
      (col("c_custkey") % 5).cast("int") + 1)
    Tables.customer(spark, dir)
      .withColumn("country_eu", europeCountry(dirty))
      .filter(col("country_eu").isNotNull)
      .select(col("c_custkey"), col("country_eu"))
      .orderBy(col("c_custkey"))
  }

  /** The full cleanse shape (filter → split-index → digit-clean+cast →
    * whitelist → decode chain → re-guard → LIKE-bucketing → bulk clean →
    * rename-projection → repair filter) mapped onto `documents`. */
  def qCleansePipeline(spark: SparkSession, dir: String): DataFrame = {
    val langNames = Seq("en" -> "English", "fr" -> "French",
                        "de" -> "German", "es" -> "Spanish")
    val topicBuckets = Seq(
      "%join%" -> "Join", "%merge%" -> "Join",
      "%scan%" -> "Scan", "%filter%" -> "Scan",
      "%sort%" -> "Sort", "%order%" -> "Sort",
      "%group%" -> "Agg", "%window%" -> "Agg")
    Tables.documents(spark, dir)
      .filter(col("n_chars") >= 100)
      .withColumn("first_word", split(col("text"), " ").getItem(0))
      .withColumn("src_num", regexp_replace(col("source"), "[^0-9]", ""))
      .filter(col("src_num") =!= "")
      .withColumn("src_num", expr("try_cast(src_num AS INT)"))
      .withColumn("lang_clean",
        when(col("lang").isin("en", "fr", "de", "es"), col("lang"))
          .otherwise(lit("UNKNOWN")))
      .withColumn("lang_meaning",
        langNames.foldLeft(lit("Desconocido")) { case (acc, (k, v)) =>
          when(col("lang_clean") === k, v).otherwise(acc)
        })
      .withColumn("lang_meaning",
        when(col("lang_clean").isin("en", "fr", "de", "es"),
             col("lang_meaning")).otherwise(lit("Desconocido")))
      .withColumn("topic_group",
        topicBuckets.reverse.foldLeft(lit("Other")) { case (acc, (pat, v)) =>
          when(col("first_word").like(pat), v).otherwise(acc)
        })
      .withColumn("clean_title",
        trim(regexp_replace(regexp_replace(substring(col("text"), 1, 40),
          "\"", ""), ",", " -")))
      .select(col("doc_id"), col("clean_title").as("title"),
              col("lang_clean").as("lang"), col("src_num"),
              col("lang_meaning"), col("first_word"), col("topic_group"))
      .filter(!col("lang_meaning").isin("Desconocido"))
      .orderBy(col("doc_id"))
  }
}
