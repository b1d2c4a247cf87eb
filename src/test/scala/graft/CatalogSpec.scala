package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-integrity invariants — the bookkeeping failure modes a
  * growing 292-query catalog actually exhibits (r5 advice: queries
  * implemented but never registered, numbering gaps, oracle keys
  * drifting from runner keys). Pure metadata, no Spark session.
  */
class CatalogSpec extends AnyFunSuite {

  private val qNum = "^q(\\d+)_".r

  test("every query is oracled or declared rows-only, and every " +
      "oracle/rows-only key names a registered query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val r = SparkEntry.rowsOnly
    assert(o.intersect(r).isEmpty,
      s"both oracled and rows-only: ${o.intersect(r)}")
    assert((o ++ r) == q,
      s"unverified: ${q -- o -- r}; orphan keys: ${(o ++ r) -- q}")
  }

  test("query numbering is contiguous from q1 with no duplicates") {
    val nums = SparkEntry.queries.keySet.toSeq.map { k =>
      qNum.findFirstMatchIn(k).fold(
        fail(s"unparseable query name: $k"))(_.group(1).toInt)
    }
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
    assert(nums.sorted == (1 to nums.max),
      s"gaps: ${((1 to nums.max).toSet -- nums.toSet).toSeq.sorted}")
  }

  test("oracle SQL selects/aliases no column Spark won't emit " +
      "(spot syntax: every oracle mentions a FROM)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("FROM"), s"$name oracle has no FROM")
    }
  }
}
