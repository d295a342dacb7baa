package graft

import graft.plans.IntervalBinRule
import org.apache.spark.sql.functions._

/** The SQL front-end rule: ad-hoc interval theta joins re-plan onto the
  * binned (entity, bin) equi-join and return byte-identical results.
  */
class IntervalBinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val a = (0 until 2000).map { i =>
      (s"e${i % 7}", (i * 131L) % 50000, (i * 131L) % 50000 + 40 + i % 300, i.toLong)
    }.toDF("entity", "start", "end", "probe_id")
    val b = (0 until 1500).map { i =>
      (s"e${i % 7}", (i * 173L) % 50000, (i * 173L) % 50000 + 25 + i % 500, i.toLong)
    }.toDF("entity", "start", "end", "fid")
    (a, b)
  }

  test("theta-join pattern rewrites to (entity, bin) equi-join with identical results") {
    val (a, b) = fixture()
    a.createOrReplaceTempView("probes_r")
    b.createOrReplaceTempView("feats_r")
    val sqlText =
      """SELECT p.probe_id, f.fid
        |FROM probes_r p JOIN feats_r f
        |  ON p.entity = f.entity AND p.start < f.end AND p.end > f.start""".stripMargin
    val before = spark.sql(sqlText).as[(Long, Long)].collect().toSet
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalBinRule
    try {
      // force the both-sides-big branch at fixture scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(sqlText)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"),
        s"rewrite must engage (bin attr in physical plan); got:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        "the quadratic physical join must be gone")
      val after = df.as[(Long, Long)].collect().toSet
      assert(after == before, "rewritten plan must return the identical pair set")
      assert(after.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == IntervalBinRule)
    }
  }

  test("broadcastable side leaves the plan alone; extra conjuncts are preserved") {
    val (a, b) = fixture()
    a.createOrReplaceTempView("probes_r")
    b.createOrReplaceTempView("feats_r")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalBinRule
    try {
      // default threshold (10 MB): tiny local fixtures stay broadcastable,
      // the guard holds and the rule must not fire
      val small = spark.sql(
        """SELECT p.probe_id, f.fid FROM probes_r p JOIN feats_r f
          |  ON p.entity = f.entity AND p.start < f.end AND p.end > f.start""".stripMargin)
      assert(!small.queryExecution.executedPlan.toString.contains("__graft_bin"))
      // with the rewrite forced on, an EXTRA predicate survives verbatim
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val extra = spark.sql(
        """SELECT p.probe_id, f.fid FROM probes_r p JOIN feats_r f
          |  ON p.entity = f.entity AND p.start < f.end AND p.end > f.start
          |     AND p.probe_id % 3 = f.fid % 3""".stripMargin)
      assert(extra.queryExecution.executedPlan.toString.contains("__graft_bin"))
      val expected = a.as("p").join(b.as("f"),
        $"p.entity" === $"f.entity" && $"p.start" < $"f.end" && $"p.end" > $"f.start" &&
          $"p.probe_id" % 3 === $"f.fid" % 3)
        .select($"p.probe_id", $"f.fid").as[(Long, Long)].collect().toSet
      assert(extra.as[(Long, Long)].collect().toSet == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == IntervalBinRule)
    }
  }
}
