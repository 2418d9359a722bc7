package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseCount, BitwiseXor, Cast, Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.graftshim.FunctionShim
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.ArrayDotProduct

/** SQL surface for the engine's native expressions, via the standard
  * extension point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes `graft_dot` / `graft_cosine` / `graft_hamming` available to every
  * `spark.sql(...)` query on the cluster, fully codegen'd (they compile to
  * the same Catalyst trees the Column API builds — no UDF boundary).
  *
  * For a session you didn't construct (notebook, test harness), use
  * [[GraftExtensions.registerAll]] instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // plan rewrite: plain-SQL point-in-interval theta-joins get the binned
    // equi-join plan (no BroadcastNestedLoopJoin) without user involvement.
    // The builder runs once per session when its optimizer is assembled —
    // the one extension hook that HAS the session — so it also performs
    // the late-batch registration (see registerLateRule: the early batch
    // runs before RewriteSubquery and never sees EXISTS/IN-born semi/anti
    // joins). An extensions-conf-only deployment therefore gets both.
    ext.injectOptimizerRule { session =>
      GraftExtensions.registerLateRule(session)
      graft.plans.RangeJoinRewrite
    }
    // statement-scoped bin width: resolve the RANGE_BIN hint into the
    // marker node RangeJoinRewrite consumes. Runs in the analyzer's
    // Resolution batch — BEFORE the "Remove Unresolved Hints" batch that
    // would otherwise drop the unknown hint name with only a warning.
    // (No post-hoc analog exists for foreign sessions: registerAll can't
    // add analyzer rules, so there the hint is dropped by Spark and the
    // conf remains the only width source.)
    ext.injectResolutionRule(_ => graft.plans.ResolveRangeBinHint)
  }
}

object GraftExtensions {

  private def asVec(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def arity2(name: String,
      args: Seq[Expression]): (Expression, Expression) = {
    require(args.length == 2,
      s"$name requires exactly 2 arguments, got ${args.length}")
    (args(0), args(1))
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** (name, info, builder) for every SQL-exposed engine function. */
  val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info("graft_dot",
        "graft_dot(a, b) - dot product of two numeric arrays"),
      (args: Seq[Expression]) => {
        val (a, b) = arity2("graft_dot", args)
        ArrayDotProduct(asVec(a), asVec(b))
      }),
    ("graft_cosine",
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => {
        val (a0, b0) = arity2("graft_cosine", args)
        val a = asVec(a0)
        val b = asVec(b0)
        Divide(ArrayDotProduct(a, b),
          Multiply(Sqrt(ArrayDotProduct(a, a)),
            Sqrt(ArrayDotProduct(b, b))))
      }),
    ("graft_hamming",
      info("graft_hamming",
        "graft_hamming(a, b) - hamming distance between two integer " +
          "bit-patterns (e.g. simhash values)"),
      (args: Seq[Expression]) => {
        val (a, b) = arity2("graft_hamming", args)
        BitwiseCount(BitwiseXor(a, b))
      }))

  /** Register every engine function on an already-running session. */
  def registerAll(spark: SparkSession): Unit = {
    functions.foreach { case (name, i, builder) =>
      FunctionShim.register(spark, name, i, builder)
    }
    registerLateRule(spark)
  }

  /** Register the plan rewrite in the LAST optimizer batch ("User
    * Provided Optimizers", via `ExperimentalMethods` — public API).
    *
    * This is both the live-session analog of `injectOptimizerRule` AND a
    * required complement to it: the extensions path injects into the
    * operator-optimization batch, which runs BEFORE `RewriteSubquery`
    * turns `EXISTS`/`IN` predicates into semi/anti joins — so a range
    * predicate inside a subquery is invisible to the early rule and would
    * keep its BroadcastNestedLoopJoin. The late batch sees those joins —
    * and receives any `RANGE_BIN` hint width for them, because the early
    * pass keeps the hint marker alive across `RewriteSubquery` whenever a
    * predicate subquery sits beneath it (see `RangeJoinRewriteFinal`,
    * the final-pass variant registered here, which consumes the width
    * and strips the marker unconditionally). Both registrations are safe
    * together: the rule never matches its own output (`_graft_bin`
    * re-entry guard), so the late pass only touches joins born after the
    * early one ran. Idempotent.
    */
  def registerLateRule(spark: SparkSession): Unit = {
    spark match {
      case c: org.apache.spark.sql.classic.SparkSession =>
        if (!c.experimental.extraOptimizations
            .contains(graft.plans.RangeJoinRewriteFinal))
          c.experimental.extraOptimizations ++=
            Seq(graft.plans.RangeJoinRewriteFinal)
      case other =>
        // don't silently degrade: without this registration theta-range
        // joins inside EXISTS/IN subqueries keep their vanilla
        // (nested-loop) plans. Through slf4j (the driver log), not
        // stderr — log4j-managed deployments never surface raw stderr.
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "graft: RangeJoinRewrite not registered in the late optimizer " +
            "batch — session is {}, not a classic SparkSession; range " +
            "predicates inside EXISTS/IN subqueries will keep " +
            "nested-loop plans",
          other.getClass.getName)
    }
  }
}
