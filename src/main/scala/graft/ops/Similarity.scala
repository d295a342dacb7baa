package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine top-k is the exact baseline; the
  * LSH-bucketed variant is the scale path (search only within a signature
  * bucket — at 1000 executors the bucket key is the shuffle key and each
  * bucket is a small local problem).
  *
  * Dot products are computed in double with a strict left-to-right fold
  * (`aggregate`), matching DuckDB's list_inner_product order, so cosine
  * values are bit-identical across engines.
  */
object Similarity {

  import graft.functions.VectorOps.dot_f

  private def withNorm(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("__n2", dot_f(col(embCol), col(embCol)))

  private def cosCol =
    dot_f(col("qe"), col("ne")) / sqrt(col("qn2") * col("nn2"))

  /** Exact top-k cosine neighbors for each query row (queries = a filtered
    * subset of the corpus; excludes self). O(|Q| * |corpus|) — the
    * correctness baseline, partitioned by broadcasting the query side.
    */
  def cosineKnnBrute(corpus: DataFrame, idCol: String, embCol: String,
      queryPred: String, k: Int): DataFrame = {
    val base = withNorm(corpus, embCol)
    val q = base.where(expr(queryPred))
      .select(col(idCol).as("qid"), col(embCol).as("qe"), col("__n2").as("qn2"))
    val n = base.select(col(idCol).as("nid"), col(embCol).as("ne"), col("__n2").as("nn2"))
    val scored = q.join(n, col("qid") =!= col("nid"))
      .withColumn("cos", cosCol)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
  }

  /** Bit signature from fixed coordinate comparisons: bit j = 1 iff
    * emb[p_j] > emb[q_j] for deterministic index pairs — a data-independent
    * LSH family (sign tests), no floats created, fully portable.
    */
  def lshBucketExpr(embCol: String, bits: Int, dim: Int): String =
    (0 until bits).map { j =>
      val p = (j * 7) % dim + 1
      val q = (j * 13 + 3) % dim + 1
      s"(CASE WHEN element_at($embCol, $p) > element_at($embCol, $q) THEN ${1L << j}L ELSE 0L END)"
    }.mkString(" + ")

  /** ANN: top-k cosine within the query's LSH bucket only. */
  def cosineKnnLsh(corpus: DataFrame, idCol: String, embCol: String,
      queryPred: String, k: Int, bits: Int = 8, dim: Int = 64): DataFrame = {
    val base = withNorm(corpus, embCol)
      .withColumn("__bkt", expr(lshBucketExpr(embCol, bits, dim)))
    val q = base.where(expr(queryPred))
      .select(col(idCol).as("qid"), col(embCol).as("qe"), col("__n2").as("qn2"),
        col("__bkt").as("qb"))
    val n = base.select(col(idCol).as("nid"), col(embCol).as("ne"), col("__n2").as("nn2"),
      col("__bkt").as("nb"))
    val scored = q.join(n, col("qb") === col("nb") && col("qid") =!= col("nid"))
      .withColumn("cos", cosCol)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "nid", "rank", "cos")
  }
}
