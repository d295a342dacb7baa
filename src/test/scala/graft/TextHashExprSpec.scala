package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** The codegen'd TextHash expressions must agree exactly with their
  * declarative HOF twins (which are themselves oracle-verified vs DuckDB).
  */
class TextHashExprSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (Seq(
    (1L, "the fast join merge table scan", "s"),
    (2L, "a", "s"),
    (3L, "spark", "s"),
    (4L, "x y z x y z x", "s"),
    (5L, "trailing space ", "s"),
    (6L, " leading", "s"),
    (7L, "double  space", "s")) ++
    (0 until 200).map(i => (100L + i,
      (0 to i % 17).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" "), "g")))
    .toDF("doc_id", "text", "source")

  test("TokenHashAllExpr == HOF tokenize spec") {
    val fast = TextOps.tokenize(docs).select("doc_id", "tokens", "n_tok")
      .collect().map(r => r.getString(0) -> ((r.getAs[scala.collection.Seq[Int]](1), r.getInt(2)))).toMap
    val spec = TextOps.tokenizeHof(docs).select("doc_id", "tokens", "n_tok")
      .collect().map(r => r.getString(0) -> ((r.getAs[scala.collection.Seq[Int]](1), r.getInt(2)))).toMap
    assert(fast == spec)
  }

  test("FingerprintExpr == HOF fingerprint spec") {
    val fast = TextOps.fingerprint(docs).as[(Long, Long)].collect().toMap
    val spec = TextOps.fingerprintHof(docs).as[(Long, Long)].collect().toMap
    assert(fast == spec)
  }

  test("expressions run inside whole-stage codegen (on a non-local source)") {
    val src = spark.range(100)
      .select(col("id").as("doc_id"),
        format_string("w%d x%d", col("id"), col("id") % 7).as("text"),
        lit("s").as("source"))
    val q = TextOps.tokenize(src)
    // "*(n)" prefixes mark WholeStageCodegen spans in the compact rendering
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"), plan.take(800))
    // and the values still match the HOF spec on the same source
    val fast = q.select("doc_id", "tokens").collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Int]](1)).toMap
    val spec = TextOps.tokenizeHof(src).select("doc_id", "tokens").collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Int]](1)).toMap
    assert(fast == spec)
  }
}
