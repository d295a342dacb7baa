package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},
  *    "sf":...,"scaling":{...}}
  *
  * Two parts:
  *  1. per-query wall clock for every SparkEntry query on
  *     $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS];
  *  2. the north_rule scaling probe: the SAME feature-engineering job
  *     (sessionize + backfill + lag/lead + as-of join over deterministic
  *     synthetic events) at local[8] and local[32] on identical input —
  *     sandbox evidence for the N->4N executor scaling-efficiency >= 0.8
  *     criterion (BASELINE.json north_rule; see BASELINE.md).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_bench"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // part 1: per-query timings
    val s1 = session(cpus)
    s1.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, dt) = timed {
        try fn(s1, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      }
      name -> dt
    }
    s1.stop()

    // part 2: N->4N scaling probes (default arms 2 vs 8 cores; full
    // methodology + ceiling analysis in BASELINE.md / ScalingBench)
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "8000000").toLong
    val scaleDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "400000").toLong
    val w = ScalingBench.measure(ScalingBench.windowJob, "window_features_asof",
      scaleN, scaleN, reps = 1)
    val t = ScalingBench.measure(ScalingBench.tokenJob, "tokenize_fingerprint_quality",
      scaleDocs, scaleDocs, reps = 1)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":{"window":${w.json},"tokens":${t.json}}}""")
  }
}
