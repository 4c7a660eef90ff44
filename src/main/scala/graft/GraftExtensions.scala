package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomMightContain, CollapseRuns, DotProduct, DotProductLong, HilbertIndex, MinHashSignature, RollingHash64, SimHash64, WordShingles}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(split(text, ' ')) ...")` works in any
  * session created with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions`). This is the standard deployment shape for a
  * Spark-native library on a shared cluster — no code changes to the
  * host application, one config line. For an already-running session
  * (notebooks), [[GraftExtensions.register]] does the same
  * registration directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // transparent MV rewrite — a no-op until a view is registered in
    // graft.plans.MvRegistry (see MvRewrite scaladoc)
    ext.injectOptimizerRule(session => graft.plans.MvRewriteRule(session))
    // FK join elimination — a no-op until a constraint is validated
    // into graft.plans.FkRegistry (see JoinElimination scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.JoinEliminationRule)
    // row-level security — a no-op until a policy is registered in
    // graft.plans.PolicyRegistry (see RowPolicy scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.RowPolicyRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def litInt(e: Expression): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"expected a literal int argument, got $other")
  }

  /** (identifier, info, builder) tuples — the single source for both
    * injection paths.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rolling_hash64"),
      info("rolling_hash64", "rolling_hash64(str) - 64-bit rolling polynomial fingerprint"),
      (args: Seq[Expression]) => RollingHash64(args.head)),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(array<string>, n) - MinHash signature"),
      (args: Seq[Expression]) => MinHashSignature(args.head, litInt(args(1)))),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(str, n) - distinct n-word shingles"),
      (args: Seq[Expression]) => WordShingles(args.head, litInt(args(1)))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(array<double>, array<double>) - sequential dot product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    (FunctionIdentifier("dot_long"),
      info("dot_long", "dot_long(array<bigint>, array<bigint>) - exact integer dot product"),
      (args: Seq[Expression]) => DotProductLong(args.head, args(1))),
    (FunctionIdentifier("hilbert_index"),
      info("hilbert_index", "hilbert_index(x, y) - order-21 Hilbert curve position of (x, y)"),
      (args: Seq[Expression]) => HilbertIndex(args.head, args(1))),
    (FunctionIdentifier("collapse_runs"),
      info("collapse_runs", "collapse_runs(str) - collapse consecutive repeated tokens"),
      (args: Seq[Expression]) => CollapseRuns(args.head)),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bitmap, h1, h2, m, k) - membership in an m-bit double-hashed Bloom filter"),
      (args: Seq[Expression]) =>
        BloomMightContain(args.head, args(1), args(2), litInt(args(3)), litInt(args(4)))),
  )

  /** Register into an already-running session (the extensions config
    * only takes effect at session build time).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
