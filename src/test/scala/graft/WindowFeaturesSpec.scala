package graft

import graft.ops.WindowFeatures
import graft.model.Synth
import org.apache.spark.sql.functions._

class WindowFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val ev = Seq(
    // entity, t, value
    ("u", 0L, Some(1.0)), ("u", 10L, None), ("u", 20L, Some(3.0)),
    ("u", 2000L, Some(4.0)), ("u", 2010L, None),
    ("v", 5L, Some(9.0))).toDF("entity", "event_time", "value")

  test("backfill carries last non-null forward, never backward") {
    val got = WindowFeatures.backfill(ev, "value")
      .select("entity", "event_time", "value_ff")
      .as[(String, Long, Option[Double])].collect().toSet
    assert(got == Set(
      ("u", 0L, Some(1.0)), ("u", 10L, Some(1.0)), ("u", 20L, Some(3.0)),
      ("u", 2000L, Some(4.0)), ("u", 2010L, Some(4.0)), ("v", 5L, Some(9.0))))
  }

  test("sessionize breaks on gap > threshold") {
    val got = WindowFeatures.sessionize(ev, gap = 100L)
      .select("entity", "event_time", "session_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("u", 0L, 0L), ("u", 10L, 0L), ("u", 20L, 0L),
      ("u", 2000L, 1L), ("u", 2010L, 1L), ("v", 5L, 0L)))
  }

  test("lag/lead per entity ordered by time") {
    val got = WindowFeatures.lagLead(ev, "value", Seq(1))
      .where(col("entity") === "u")
      .orderBy("event_time")
      .select("value_lag1", "value_lead1")
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(
      (None, None), (Some(1.0), Some(3.0)), (None, Some(4.0)),
      (Some(3.0), None), (Some(4.0), None)))
  }

  test("synthetic token_seqs: n_tok == tokens.length, identical across parallelism (input_hint invariant)") {
    val a = Synth.tokenSeqs(spark, 500).collect()
    assert(a.forall(r => r.getAs[scala.collection.Seq[Int]]("tokens").length == r.getAs[Int]("n_tok")))
    val b = Synth.tokenSeqs(spark, 500).repartition(13).collect()
    val am = a.map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Int]]("tokens")).toMap
    val bm = b.map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Int]]("tokens")).toMap
    assert(am == bm, "token-array equality per row at any parallelism")
    // skew fixture present: some docs get ~5x max length
    assert(a.exists(_.getAs[Int]("n_tok") > 512))
  }
}
