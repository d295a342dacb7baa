package graft

import graft.ops.TextOps
import graft.sources.GffSource
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

  test("SimHashExpr == HOF simhash spec (16 and 8 bits)") {
    for (bits <- Seq(8, 16)) {
      val fast = graft.ops.Dedup.simHash(docs, "doc_id", "text", bits)
        .as[(Long, Long)].collect().toMap
      val spec = graft.ops.Dedup.simHashHof(docs, "doc_id", "text", bits)
        .as[(Long, Long)].collect().toMap
      assert(fast == spec, s"bits=$bits")
    }
  }

  test("FingerprintExpr == HOF fingerprint spec") {
    val fast = TextOps.fingerprint(docs).as[(Long, Long)].collect().toMap
    val spec = TextOps.fingerprintHof(docs).as[(Long, Long)].collect().toMap
    assert(fast == spec)
  }

  test("GraftExtensions registers the expressions as SQL functions") {
    // extensions apply only at SESSION CREATION: force a fresh session over
    // the same context, then restore the shared test session as default
    val SS = org.apache.spark.sql.SparkSession
    SS.clearActiveSession(); SS.clearDefaultSession()
    val s2 = SS.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val rows = docs.collect().toSeq
      import scala.jdk.CollectionConverters._
      s2.createDataFrame(rows.asJava, docs.schema).createOrReplaceTempView("ext_docs")
      val viaSql = s2.sql(
        "SELECT doc_id, token_hash_all(text) AS tokens, fingerprint64(text) AS fp FROM ext_docs")
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[scala.collection.Seq[Int]](1), r.getLong(2)))).toMap
      val viaApi = TextOps.tokenize(docs).join(TextOps.fingerprint(docs), "doc_id")
        .select("doc_id", "tokens", "fingerprint")
        .collect().map(r => r.getString(0).toLong ->
          ((r.getAs[scala.collection.Seq[Int]](1), r.getLong(2)))).toMap
      assert(viaSql == viaApi)
      val dot = s2.sql(
        "SELECT dot_f(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(2 AS FLOAT), CAST(0.5 AS FLOAT)))")
        .collect()(0).getDouble(0)
      assert(dot == 4.0)
    } finally {
      SS.setDefaultSession(spark); SS.setActiveSession(spark)
    }
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

  test("GffAttrsExpr == the regexp_extract spec on adversarial attrs") {
    // hand-picked adversarial shapes + a deterministic fuzz corpus
    val hand = Seq(
      "ID=a;Parent=b;gene_name=g1",
      "ID=;ID=second",               // empty first run: regex takes the next
      "XID=embedded;Parent=p",       // substring match, no anchor
      "Parent=p only",
      "gene_name=has spaces;ID=x",   // attrKey run may contain spaces
      "gene_name=;gene_name=v2",
      "ID=a\tParent=tab-sep",        // \s stops ID/Parent runs
      "ID=a Parent=b gene_name=c",
      ";;;",
      "",
      "ID=",
      "ID=;",
      "gene_name=",
      "no keys at all",
      "ID==double;Parent=ok",        // '=' is a valid run char
      "ID=trail;",
      "PParent=pp;ID=i",
      "gene_name=v;extra=ID=inside")
    val charset = Array("ID=", "Parent=", "gene_name=", ";", " ", "\t", "a", "b",
      "=", "g1", "x;y", "\r", "Z")
    val fuzz = (0 until 400).map { i =>
      val r = new scala.util.Random(i * 7919)
      (0 until (1 + r.nextInt(8))).map(_ => charset(r.nextInt(charset.length))).mkString
    }
    val df = (hand ++ fuzz).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("k", "attrs")
    val both = GffSource.attrRegexSpec(df)
      .withColumn("__ga", graft.functions.TextHash.gff_attrs(col("attrs"), "gene_name"))
      .select(col("k"), col("attrs"),
        col("id_spec"), col("parent_spec"), col("attr_spec"),
        col("__ga.id"), col("__ga.parent"), col("__ga.attr"))
      .collect()
    both.foreach { r =>
      assert(r.get(2) == r.get(5) && r.get(3) == r.get(6) && r.get(4) == r.get(7),
        s"mismatch on attrs='${r.get(1)}': spec=(${r.get(2)},${r.get(3)},${r.get(4)}) " +
          s"fused=(${r.get(5)},${r.get(6)},${r.get(7)})")
    }
    // the corpus must exercise both branches (matches AND no-matches)
    assert(both.exists(_.get(2) != null), "fixture must produce ID matches")
    assert(both.exists(_.get(2) == null), "fixture must produce ID non-matches")
  }
}
