package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stratified group sampling (reference: src/commands/sample.rs:39-84 —
  * per-seqid sample of ceil(ratio*n) root groups WITHOUT replacement).
  *
  * The reference uses a thread-local RNG (sample.rs:57,70) — NOT
  * reproducible. We fix determinism by spec (SURVEY.md §7 "what's hard" #6):
  * rank groups by a Knuth multiplicative hash of the group key and keep the
  * lowest ceil(ratio*n) per stratum. Identical output at any parallelism
  * level, and expressible verbatim in ANSI SQL for the oracle.
  */
object Sampling {

  /** df must have unique (stratum, key) pairs. Keeps ceil(ratio*n) per
    * stratum (matches the reference's per-seqid ceil, sample.rs:69).
    */
  def stratifiedGroupSample(df: DataFrame, stratum: String, key: String,
      ratio: Double): DataFrame = {
    val h = pmod(col(key) * lit(2654435761L), lit(1000003L))
    val wRank = Window.partitionBy(col(stratum)).orderBy(h, col(key))
    val wAll = Window.partitionBy(col(stratum))
    df.withColumn("__rk", row_number().over(wRank).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .where(col("__rk") <= ceil(col("__n") * ratio).cast("long"))
      .drop("__rk", "__n")
  }
}
