package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-name registration for the library's native expressions, so the
  * general SQL surface (SURVEY.md §3 EP3) can call them too:
  *
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *   SELECT simhash64(tokens), minhash_md5_sigs(shingles, 16), ...
  *
  * Two entry points with identical registrations:
  *  - `GraftExtensions` for config-time injection
  *    (`spark.sql.extensions=graft.functions.GraftExtensions`), the
  *    standard way to ship custom functions with a library;
  *  - `GraftFunctions.register(spark)` for a live session (used by the
  *    temp-view SQL surface and tests).
  */
object GraftFunctions {

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")

  /** Accept any foldable integer expression (literal, CAST of one, …),
    * not just a bare Literal. */
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case f if f.foldable => f.eval() match {
      case v: Int => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer constant, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$what must be an integer constant, got $other")
  }

  /** name → (builder, usage) for every native expression. */
  val all: Seq[(String, (Seq[Expression] => Expression, String))] = Seq(
    "vec_dot" -> ((args: Seq[Expression]) => {
      arity("vec_dot", args, 2)
      FloatVecDot(args(0), args(1))
    },
      "vec_dot(a, b) — double-precision dot product of two array<float>"),
    "simhash64" -> ((args: Seq[Expression]) => {
      arity("simhash64", args, 1)
      SimHash64(args(0))
    },
      "simhash64(tokens) — 64-bit SimHash of an array<string>"),
    "minhash_md5_sigs" -> ((args: Seq[Expression]) => {
      arity("minhash_md5_sigs", args, 2)
      MinHashMd5Sigs(args(0), intArg(args(1), "nSeeds"))
    },
      "minhash_md5_sigs(shingles, n) — n md5 MinHash signatures"),
    "min_shingle_md5" -> ((args: Seq[Expression]) => {
      arity("min_shingle_md5", args, 2)
      MinShingleMd5(args(0), intArg(args(1), "shingleLen"))
    },
      "min_shingle_md5(s, len) — min md5 over len-char shingles"),
    "jaccard_sim" -> ((args: Seq[Expression]) => {
      arity("jaccard_sim", args, 2)
      JaccardSim(args(0), args(1))
    },
      "jaccard_sim(a, b) — set Jaccard of two array<string>"))

  /** Register into a live session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, (builder, _)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

/** `spark.sql.extensions` entry point: native functions by SQL name
  * plus the planner strategy for the library's custom logical plans
  * (graft.plans.AsOfJoinNode → AsOfJoinExec). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, (builder, usage)) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name, usage),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectCheckRule(graft.plans.CartesianGuard(_))
  }
}
