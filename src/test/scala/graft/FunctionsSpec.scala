package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftFunctions}

class FunctionsSpec extends AnyFunSuite {
  import TestSpark.{spark => tspark}

  test("a registered scalar UDF matches the native normText column " +
      "(surface parity; native stays the production path)") {
    import tspark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val normUdf = udf((s: String) =>
      if (s == null) null
      else s.toLowerCase.replaceAll("\\s+", " ").trim)
    tspark.udf.register("norm_udf", normUdf)
    val df = Seq("  The  QUICK\tfox ", "a", "", null, " x\n y ")
      .toDF("t")
      .select(graft.functions.Cols.normText(col("t")).as("native"),
        org.apache.spark.sql.functions.expr("norm_udf(t)").as("viaUdf"))
    df.collect().foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }
  import TestSpark._

  test("native expressions are callable by SQL name after register") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
        |""".stripMargin).head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql("SELECT simhash64(array('a', 'b', 'c'))")
      .head().getLong(0)
    // deterministic sketch: identical token arrays hash identically
    assert(sh == spark.sql("SELECT simhash64(array('a', 'b', 'c'))")
      .head().getLong(0))
    val sig = spark.sql(
      "SELECT minhash_md5_sigs(array('ab', 'cd'), 4)")
      .head().getSeq[String](0)
    assert(sig.length == 4 && sig.forall(_.matches("[0-9a-f]{32}")))
    // md5 portability anchor: seed 0, single shingle == md5('0|ab')
    val anchor = spark.sql("SELECT minhash_md5_sigs(array('ab'), 1)[0]," +
      " md5('0|ab')").head()
    assert(anchor.getString(0) == anchor.getString(1))
  }

  test("SQL surface uses vec_dot over the embeddings view") {
    Tables.registerViews(spark, sf)
    GraftFunctions.register(spark)
    val n = spark.sql(
      """SELECT vec_id, vec_dot(embedding, embedding) AS norm
        |FROM embeddings WHERE vec_id < 3""".stripMargin)
      .collect()
    assert(n.length == 3 && n.forall(_.getDouble(1) > 0))
  }

  test("vec_dot keeps HOF semantics on degenerate input (null, ragged)") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f, 4.0f)),
      (Seq[java.lang.Float](1.0f), Seq[java.lang.Float](3.0f, 4.0f)),
      (Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](3.0f, 4.0f)),
      (null, Seq[java.lang.Float](3.0f)))
      .toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    val hof = "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y)," +
      " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val rows = df.selectExpr("vec_dot(a, b) AS native", s"$hof AS hof")
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    // rows 1 (ragged), 2 (null element), 3 (null input) must all be NULL
    assert(rows.drop(1).forall(_.isNullAt(0)))
    assert(!rows.head.isNullAt(0) && rows.head.getDouble(0) == 11.0)
  }

  test("extension class wires the same builders for config-time use") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders shared
    assert(GraftFunctions.all.map(_._1).toSet ==
      Set("vec_dot", "simhash64", "minhash_md5_sigs", "min_shingle_md5",
        "jaccard_sim"))
  }

  test("jaccard_sim equals the array_intersect/array_union composite " +
      "on duplicates, disjoint sets, empties, and null elements") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),        // 2/4
      (Seq("a", "a", "b"), Seq("b", "b", "a")),        // dup elements: 2/2
      (Seq("a"), Seq("x")),                            // disjoint: 0/2
      (Seq("a", "b"), Seq[String]()),                  // empty side: 0/2
      (Seq[String]("a", null), Seq("a", "b", null)),   // null element
      (Seq[String](null), Seq[String](null))           // null-only: 1/1
    ).toDF("a", "b")
    val rows = df.selectExpr("jaccard_sim(a, b) AS native",
      "CAST(size(array_intersect(a, b)) AS DOUBLE) " +
        "/ CAST(size(array_union(a, b)) AS DOUBLE) AS hof")
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
    assert(rows(0).getDouble(0) == 0.5)
    assert(rows(4).getDouble(0) == 2.0 / 3.0) // {a, null} ∩/∪ {a, b, null}
    assert(rows(5).getDouble(0) == 1.0)
  }

  test("simhash_md5 equals the nibble-arithmetic HOF reference on " +
      "real corpus token lists (the q297 oracle's exact formula)") {
    import org.apache.spark.sql.functions._
    // reference: bit j of the sketch = sign of the sum over tokens of
    // ±1 by in-nibble bit j%4 of md5-hex char 16 − j/4 — the identical
    // arithmetic the DuckDB oracle runs; the expression must match it
    // bit for bit on every doc of the test corpus
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        split(graft.functions.Cols.normText(col("text")), " ").as("w"))
    val native = docs.select(col("doc_id"),
      graft.functions.TextExprs.simhashMd5(col("w")).as("sk"))
    val refSk = docs
      .select(col("doc_id"), explode(col("w")).as("t"))
      .crossJoin(spark.range(0, 64).select(col("id").cast("int").as("j")))
      .withColumn("nib", expr(
        "CAST(conv(substring(md5(t), 16 - (j div 4), 1), 16, 10) AS INT)"))
      .withColumn("sgn",
        when(expr("(shiftright(nib, j % 4) & 1) = 1"), lit(1))
          .otherwise(lit(-1)))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("sgn")).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("c") > 0, expr("shiftleft(1L, j)"))
        .otherwise(lit(0L))).as("sk"))
    val nat = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refSk.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nat.keySet == want.keySet)
    nat.foreach { case (id, sk) =>
      assert(sk == want(id), s"doc $id: native $sk != reference ${want(id)}")
    }
  }

  test("approx percentile tracks the exact percentile") {
    import org.apache.spark.sql.functions._
    val both = Tables.orders(spark, sf)
      .agg(expr("percentile(o_totalprice, 0.5)").as("exact"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx"))
      .head()
    val (exact, approx) = (both.getDouble(0), both.getDouble(1))
    assert(math.abs(exact - approx) / exact < 0.05)
  }
}
