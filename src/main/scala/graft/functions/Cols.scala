package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared across operators.
  *
  * Oracle-parity discipline (SURVEY.md §7 risk 4): never sum raw doubles —
  * float addition is order-dependent, and Spark's task ordering differs
  * from DuckDB's. Monetary/quantity doubles in the testdata are 2-decimal
  * values, so casting to DECIMAL before aggregating makes the arithmetic
  * exact and engine-independent. This also holds at 100 TB: decimal sums
  * are associative, so partial (map-side) aggregation stays correct.
  */
object Cols {
  /** Exact 2-decimal view of a monetary/quantity double column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Sum with exact decimal arithmetic; final cast to double because a
    * correctly-rounded decimal→double conversion is bitwise identical
    * across engines, while decimal scale *rendering* is not. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal numerator converted to double,
    * divided by an exact long count. IEEE division of identical inputs is
    * bitwise deterministic across engines, unlike averaging raw doubles. */
  def davg(c: Column): Column =
    sum(dec(c)).cast("double") / count(c).cast("double")

  /** Lower-case, whitespace-collapsed, trimmed text — the canonical form
    * used by dedup/fingerprint operators. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint: md5 of the canonical text (engine-portable,
    * unlike murmur3 `hash()`). */
  def fingerprint(c: Column): Column = md5(normText(c))
}
