package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions module: registers the engine's codegen'd
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * token_hash_all(text) ...")` works like any built-in (SURVEY §2.8 —
  * the (b) escalation path, exposed through the standard extension
  * mechanism rather than a session-local registry).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or programmatically via `withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("token_hash_all"),
      info("token_hash_all",
        "token_hash_all(text) - whitespace tokens -> array<int> of 31-polynomial word hashes mod 50257 (the input_hint tokens column)"),
      (children: Seq[Expression]) => TokenHashAllExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("fingerprint64"),
      info("fingerprint64",
        "fingerprint64(text) - positional rolling-hash 64-bit document fingerprint"),
      (children: Seq[Expression]) => FingerprintExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      info("dot_f",
        "dot_f(x, y) - strict left-to-right double dot product of two float arrays"),
      (children: Seq[Expression]) => DotExpr(children.head, children(1))))
    // SQL front-end for the interval family: ad-hoc theta joins matching
    // the overlap or containment patterns re-plan onto the binned
    // (entity, bin) equi-join (see graft.plans.IntervalBinRule — the last
    // fidelity gap between SparkEntry.queries and user SQL) ...
    ext.injectOptimizerRule(_ => graft.plans.IntervalBinRule)
    // ... and ad-hoc point-in-time SQL (join on f.t <= p.t + max_by per
    // probe) re-plans onto the leakage-safe windowed as-of shape
    // (graft.plans.AsOfAggRule).
    ext.injectOptimizerRule(_ => graft.plans.AsOfAggRule)
  }
}
