package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{IntersectCount, MinHashBands, PqAdc, ShingleHash, SimHash64, VecDot}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql("...")` users get
  * the same codegen'd operators as the Column API
  * (`vec_dot`, `shingle_hash`, `intersect_count`, `minhash_bands`,
  * `simhash64`, `pq_adc`).
  *
  * Usage (either):
  *   - `SparkSession.builder.withExtensions(new GraftExtensions)` in code;
  *   - `--conf spark.sql.extensions=graft.plans.GraftExtensions` on a
  *     cluster, which is how every node of a 1000-executor job picks the
  *     functions up with no code change.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // per-query scan budget (Athena workgroup BytesScannedCutoffPerQuery
    // analog, serverless.yml:422) — enforced at query-stage preparation
    // when spark.graft.scanBudget.bytes is set
    ext.injectQueryStagePrepRule(ScanBudgetRule.apply)
    // SQL UPDATE/MERGE/DELETE on GraftCatalog tables: injected strategies
    // run before the built-ins, so these plans execute as the commit
    // log's own row-level commits instead of the planner's
    // "does not support UPDATE TABLE" refusal
    ext.injectPlannerStrategy(_ => graft.lake.GraftDmlStrategy)
    // spark.readStream.table("cat.db.t") on graft catalog tables: the
    // analyzer bridge to the V1 change-feed source (analyzer rules bind
    // at session build — no runtime register() twin exists for this one)
    ext.injectResolutionRule(s => new graft.lake.GraftStreamSourceRule(s))
  }
}

object GraftExtensions {

  /** Runtime registration into an existing session (notebooks/shells/tests
    * that didn't control the builder); cluster jobs should prefer
    * `spark.sql.extensions=graft.plans.GraftExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftnative.registerFunction(
        spark, FunctionIdentifier(name), i, builder)
    }
    // the runtime twin of injectPlannerStrategy (idempotent)
    if (!spark.experimental.extraStrategies
        .contains(graft.lake.GraftDmlStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.lake.GraftDmlStrategy
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def oneArg(name: String, f: Expression => Expression)
      : FunctionRegistry.FunctionBuilder = {
    case Seq(a) => f(a)
    case args =>
      throw new IllegalArgumentException(s"$name expects 1 argument, got ${args.length}")
  }

  private def twoArg(name: String, f: (Expression, Expression) => Expression)
      : FunctionRegistry.FunctionBuilder = {
    case Seq(a, b) => f(a, b)
    case args =>
      throw new IllegalArgumentException(s"$name expects 2 arguments, got ${args.length}")
  }

  val functions: Seq[(String, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - double-precision dot product of two float arrays"),
      twoArg("vec_dot", VecDot(_, _))),
    ("shingle_hash",
      info("shingle_hash", "shingle_hash(text) - sorted distinct word-trigram hashes"),
      oneArg("shingle_hash", ShingleHash(_))),
    ("intersect_count",
      info("intersect_count",
        "intersect_count(a, b) - common-element count of two sorted distinct long arrays"),
      twoArg("intersect_count", IntersectCount(_, _))),
    ("minhash_bands",
      info("minhash_bands",
        "minhash_bands(features) - 16 LSH band signatures from 64 MinHashes"),
      oneArg("minhash_bands", MinHashBands(_, 64, 4))),
    ("simhash64",
      info("simhash64", "simhash64(features) - 64-bit bit-vote SimHash signature"),
      oneArg("simhash64", SimHash64(_))),
    ("pq_adc",
      info("pq_adc",
        "pq_adc(codes, lut, k) - product-quantization ADC score: sum over subspaces j of lut[j*k + codes[j]] (k = literal codebook size)"),
      {
        case Seq(a, b, k) if k.foldable && k.eval() != null =>
          PqAdc(a, b, k.eval().asInstanceOf[Number].intValue)
        case _ =>
          throw new IllegalArgumentException(
            "pq_adc expects (codes, lut, non-null literal k)")
      }))
}
