package graft

import graft.model.Synth
import graft.ops.{FusedStack, WindowFeatures}
import org.apache.spark.sql.functions._

/** The one-pass fused stack must equal the declarative Window stack
  * value-for-value on data with nulls, duplicate timestamps, and entity
  * boundaries — at any partitioning.
  */
class FusedStackSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(r => r.getLong(cols.indexOf("event_id")) -> r.toSeq).toMap
  }

  test("fused one-pass stack == declarative Window stack (nulls, dup ts, entities)") {
    val ev = Synth.events(spark, 20000L, nEntities = 37)
      .withColumn("cents",
        when(col("value").isNotNull, round(col("value") * 100).cast("long")))
    val declarative = WindowFeatures.stack(ev, "value", Seq(1, 2), "value",
      "cents", 5, gap = 40L, tiebreak = "event_id")
    val fused = FusedStack.stack(ev, "value", Seq(1, 2), "value",
      "cents", 5, gap = 40L, tiebreak = "event_id")
    assert(canon(fused) == canon(declarative))
    // partitioning invariance
    val fused2 = FusedStack.stack(ev.repartition(3), "value", Seq(1, 2), "value",
      "cents", 5, gap = 40L, tiebreak = "event_id")
    assert(canon(fused2) == canon(declarative))
  }

  test("fused stack: single-row entities, all-null value entity") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10L, Option.empty[Double], Option(5L)),
      ("b", 2L, 10L, Option(1.5), Option.empty[Long]),
      ("b", 3L, 11L, Option.empty[Double], Option(7L)),
      ("b", 4L, 99L, Option(2.5), Option(9L))
    ).toDF("entity", "event_id", "event_time", "value", "cents")
    val d = WindowFeatures.stack(df, "value", Seq(1), "value", "cents", 2,
      gap = 10L, tiebreak = "event_id")
    val f = FusedStack.stack(df, "value", Seq(1), "value", "cents", 2,
      gap = 10L, tiebreak = "event_id")
    assert(canon(f) == canon(d))
    // session break: t jumps 11 -> 99 with gap 10 -> new session
    val sess = f.where(col("event_id") === 4).select("session_id").collect()(0).getLong(0)
    assert(sess == 1L)
  }
}
