package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization to the
  * input_hint shape, language-ID heuristic, quality scoring, token counting,
  * document fingerprinting. All pure Catalyst higher-order functions —
  * codegen-friendly, no UDFs — and every numeric derivation is exact
  * integer / IEEE-deterministic arithmetic so the DuckDB oracle twins match
  * bit-for-bit.
  */
object TextOps {

  /** Portable polynomial word hash: fold acc*31 + ascii(char). Exact for
    * words up to ~12 chars (max |acc| < 2^63); deterministic and
    * reproducible in ANSI SQL (the dictionary-encoding analog of the
    * reference's string->dense-id maps, index_builder/core.rs:141-144).
    */
  def wordHashExpr(w: String): String =
    // lambda vars deliberately unique (wacc/wi): callers may embed this
    // inside their own HOF lambdas and Spark resolves shadowed names to the
    // innermost binding, silently changing semantics.
    s"aggregate(sequence(1, length($w)), 0L, (wacc, wi) -> wacc * 31 + ascii(substring($w, wi, 1)))"

  /** documents(text) -> the input_hint table
    * (doc_id string, tokens array<int32>, n_tok int32, source string).
    * Token id = wordHash % 50257. Per-row invariant: token-array equality
    * vs any independent recomputation (BASELINE.json input_hint).
    */
  def tokenize(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    docs.select(
      col(idCol).cast("string").as("doc_id"),
      graft.functions.TextHash.token_hash_all(col(textCol)).as("tokens"),
      col(sourceCol).as("source"))
      .withColumn("n_tok", size(col("tokens")))
      .select("doc_id", "tokens", "n_tok", "source")

  /** Declarative (HOF) twin of [[tokenize]] — slower (interpreted lambdas)
    * but built-ins only; kept as the executable spec the codegen'd
    * expression is tested against.
    */
  def tokenizeHof(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    docs.select(
      col(idCol).cast("string").as("doc_id"),
      expr(s"transform(split($textCol, ' '), w -> CAST(${wordHashExpr("w")} % 50257 AS INT))")
        .as("tokens"),
      expr(s"size(split($textCol, ' '))").cast("int").as("n_tok"),
      col(sourceCol).as("source"))

  /** Marker-set language/topic-ID heuristic: score = marker-word hits per
    * profile, argmax with first-wins tie-break (n-gram-profile LID shape).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "c0" -> Seq("the", "a", "join", "merge"),
    "c1" -> Seq("table", "scan", "row", "column"),
    "c2" -> Seq("fast", "slow", "big", "small"),
    "c3" -> Seq("sort", "hash", "group", "order"),
    "c4" -> Seq("data", "value", "stream", "batch"))

  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = LangProfiles.foldLeft(docs) { case (d, (name, words)) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      d.withColumn(s"n_$name",
        expr(s"size(filter(split($textCol, ' '), w -> w IN ($set)))").cast("long"))
    }
    val names = LangProfiles.map(_._1)
    val pred = names.init.zipWithIndex.foldRight(lit(names.last): Column) { case ((n, i), els) =>
      val ge = names.drop(i + 1).map(m => col(s"n_$n") >= col(s"n_$m")).reduce(_ && _)
      when(ge, lit(n)).otherwise(els)
    }
    scored.select((col(idCol) +: names.map(n => col(s"n_$n")) :+ pred.as("lang_pred")): _*)
  }

  /** Quality metrics: word count, average word length, stopword ratio,
    * long-word ratio, linear quality score. All divisions are explicit
    * double/double (IEEE-identical across engines).
    */
  def quality(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_words", expr(s"size(split($textCol, ' '))").cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(split($textCol, ' '), w -> w IN ('the', 'a')))").cast("long"))
      .withColumn("n_long",
        expr(s"size(filter(split($textCol, ' '), w -> length(w) >= 6))").cast("long"))
      .withColumn("avg_word_len",
        (length(col(textCol)).cast("double") - (col("n_words") - 1).cast("double"))
          / col("n_words").cast("double"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words").cast("double"))
      .withColumn("long_ratio", col("n_long").cast("double") / col("n_words").cast("double"))
      .withColumn("quality",
        lit(0.5) * col("long_ratio") + lit(0.3) * (lit(1.0) - col("stop_ratio"))
          + lit(0.2) * least(col("avg_word_len") / lit(8.0), lit(1.0)))
      .select(idCol, "n_words", "n_stop", "n_long", "avg_word_len", "stop_ratio",
        "long_ratio", "quality")

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      expr(s"size(split($textCol, ' '))").cast("long").as("n_ws"),
      expr(s"size(regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").cast("long")
        .as("n_re"),
      length(col(textCol)).cast("long").as("n_chars_computed"))

  /** Positional rolling-hash document fingerprint:
    * sum_i (wordHash(w_i) % P) * ((i * K) % P) — order-sensitive, exact
    * 64-bit, reproducible in SQL (≙ content-defined document identity).
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      graft.functions.TextHash.fingerprint64(col(textCol)).as("fingerprint"))

  /** Declarative (HOF) twin of [[fingerprint]] — the executable spec. */
  def fingerprintHof(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      expr(
        s"""aggregate(sequence(1, size(split($textCol, ' '))), 0L,
           | (acc, i) -> acc + (${wordHashExpr(s"element_at(split($textCol, ' '), i)")} % 1000003)
           |                   * ((i * 2654435761L) % 1000003))""".stripMargin)
        .as("fingerprint"))
}
