package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core row types of the engine (SURVEY.md §1.4).
  *
  * `TokenSeq` is the authoritative input shape (BASELINE.json `input_hint`):
  * a table of pre-tokenized training sequences. `FeatureInterval` re-expresses
  * the reference's interval payload `(start, end, root_fid)`
  * (reference: src/utils/tree.rs:6-10) as a half-open `[start, end)` validity
  * interval per entity; `Probe`/`PointProbe` are the query side
  * (reference: src/commands/intersect.rs:172-230).
  */
final case class TokenSeq(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

final case class FeatureInterval(
    entity: String,
    start: Long, // 0-based inclusive (normalized, reference index_builder/core.rs:102-109)
    end: Long,   // 0-based EXCLUSIVE (half-open)
    group_id: Long,
    ftype: String,
    attr: String)

final case class Probe(probe_id: Long, entity: String, start: Long, end: Long)

final case class PointProbe(probe_id: Long, entity: String, t: Long)

final case class Event(entity: String, event_time: Long, value: java.lang.Double)

/** Deterministic seeded synthetic generators. All columns derive from
  * `spark.range` ids through `xxhash64` — identical output at any
  * parallelism level (local[2] == local[32]), no wall clock, no RNG state.
  * (SURVEY.md §5 fixture F1-F4; FIXTURES.md.)
  */
object Synth {
  val Vocab = 50257L // GPT-2-ish vocab size for token ids

  /** F1 `token_seqs` — the input_hint table. ~1% of docs get a long-tail
    * n_tok (skew fixture for hot-entity salting tests).
    */
  def tokenSeqs(spark: SparkSession, nDocs: Long, seed: Long = 42L, maxTok: Int = 512): DataFrame = {
    val h = xxhash64(col("id"), lit(seed))
    spark.range(nDocs)
      .withColumn("doc_id", format_string("doc_%08d", col("id")))
      .withColumn("__h", h)
      .withColumn("n_tok",
        when(pmod(col("__h"), lit(100)) === 0,
          (lit(maxTok) * 4 + pmod(xxhash64(col("id"), lit(seed + 1)), lit(maxTok)).cast("int")).cast("int"))
          .otherwise((lit(1) + pmod(col("__h"), lit(maxTok))).cast("int")))
      .withColumn("tokens",
        transform(sequence(lit(0), col("n_tok") - 1),
          i => pmod(xxhash64(col("id"), i, lit(seed + 2)), lit(Vocab)).cast("int")))
      .withColumn("source",
        element_at(array(lit("web"), lit("book"), lit("code"), lit("wiki")),
          (pmod(col("__h"), lit(4)) + 1).cast("int")))
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
  }

  /** F2 `feature_intervals` — annotation side; includes touching-interval and
    * duplicate-attr edge cases by construction (dense deterministic coords).
    */
  def featureIntervals(spark: SparkSession, n: Long, nEntities: Int = 16,
      coordRange: Long = 100000L, seed: Long = 42L): DataFrame = {
    val h1 = xxhash64(col("id"), lit(seed))
    val h2 = xxhash64(col("id"), lit(seed + 1))
    spark.range(n)
      .withColumn("entity", format_string("e%02d", pmod(xxhash64(col("id"), lit(seed + 3)), lit(nEntities.toLong)).cast("int")))
      .withColumn("start", pmod(h1, lit(coordRange)))
      .withColumn("end", col("start") + 1 + pmod(h2, lit(200L)))
      .withColumn("group_id", expr("id DIV 4")) // ~4 features per group (integer division; `/` would be a per-row-unique DOUBLE)
      .withColumn("ftype",
        element_at(array(lit("gene"), lit("mRNA"), lit("exon"), lit("CDS")),
          (pmod(h2, lit(4)) + 1).cast("int")))
      .withColumn("attr", concat(lit("attr_"), pmod(h1, lit(64)).cast("string")))
      .select(col("id").as("fid"), col("entity"), col("start"), col("end"),
        col("group_id"), col("ftype"), col("attr"))
  }

  /** F3 `probes` — query side. */
  def probes(spark: SparkSession, n: Long, nEntities: Int = 16,
      coordRange: Long = 100000L, seed: Long = 7L): DataFrame = {
    val h1 = xxhash64(col("id"), lit(seed))
    val h2 = xxhash64(col("id"), lit(seed + 1))
    spark.range(n)
      .withColumn("entity", format_string("e%02d", pmod(xxhash64(col("id"), lit(seed + 2)), lit(nEntities.toLong)).cast("int")))
      .withColumn("start", pmod(h1, lit(coordRange)))
      .withColumn("end", col("start") + 1 + pmod(h2, lit(300L)))
      .select(col("id").as("probe_id"), col("entity"), col("start"), col("end"))
  }

  /** F3b `skewed probes` — hot-entity long-tail fixture: HALF of all rows
    * land on one entity ("e00"), the rest spread over `nEntities - 1`
    * (the skew-handling measurement input; reference analog: one
    * chromosome holding half the reads, depth.rs:29-31).
    */
  def skewedProbes(spark: SparkSession, n: Long, nEntities: Int = 64,
      coordRange: Long = 100000L, seed: Long = 7L): DataFrame = {
    val h1 = xxhash64(col("id"), lit(seed))
    val h2 = xxhash64(col("id"), lit(seed + 1))
    val he = xxhash64(col("id"), lit(seed + 2))
    spark.range(n)
      .withColumn("entity",
        when(pmod(he, lit(2)) === 0, lit("e00"))
          .otherwise(format_string("e%02d",
            (pmod(he, lit((nEntities - 1).toLong)) + 1).cast("int"))))
      .withColumn("start", pmod(h1, lit(coordRange)))
      .withColumn("end", col("start") + 1 + pmod(h2, lit(300L)))
      .select(col("id").as("probe_id"), col("entity"), col("start"), col("end"))
  }

  /** F4 `events` — feature-engineering side with seeded jitter, duplicate
    * timestamps and injected nulls (backfill tests).
    */
  def events(spark: SparkSession, n: Long, nEntities: Int = 64, seed: Long = 11L): DataFrame = {
    val h1 = xxhash64(col("id"), lit(seed))
    val h2 = xxhash64(col("id"), lit(seed + 1))
    spark.range(n)
      .withColumn("entity", format_string("u%03d", pmod(h1, lit(nEntities.toLong)).cast("int")))
      .withColumn("event_time", (col("id") * 7) + pmod(h2, lit(5L))) // monotone-ish + jitter, dupes possible
      .withColumn("value",
        when(pmod(h2, lit(7)) === 0, lit(null).cast("double"))
          .otherwise((pmod(h1, lit(100000)).cast("double")) / 100.0))
      .select(col("id").as("event_id"), col("entity"), col("event_time"), col("value"))
  }
}
