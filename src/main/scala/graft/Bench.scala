package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},
  *    "sf":...,"scaling":{...}}
  *
  * Two parts:
  *  1. per-query wall clock for every SparkEntry query on
  *     $SPARK_GRAFT_SF_DIR at local[$SPARK_GRAFT_CPUS]. Each query is
  *     driven by a full-column xxhash64 checksum aggregate, NOT count():
  *     count() lets Catalyst prune every projection, so map-only queries
  *     (tokenize, simhash, lag/lead) would time a bare parquet row count
  *     instead of the feature computation.
  *  2. the north_rule scaling probe: the SAME feature-engineering jobs at
  *     local[2] vs local[8] on identical input (N->4N executor
  *     scaling-efficiency >= 0.8 criterion; BASELINE.json north_rule).
  *     Each probe runs in a FRESH subprocess JVM — round 1 measured the
  *     probes inside this JVM right after the 160-s query sweep, and the
  *     fragmented heap + leftover tmpfs spill skewed the small arm 3.8x
  *     slow (BENCH_r01 reported 0.28 for a job whose controlled efficiency
  *     is >= 0.8; see BASELINE.md methodology).
  */
object Bench {

  private val BenchSpillDir =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_bench"
    else System.getProperty("java.io.tmpdir") + "/graft_bench"

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    ScalingBench.cleanDir(BenchSpillDir)
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", BenchSpillDir)
      .getOrCreate()
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Run graft.ScalingBench in a fresh JVM (same flags/classpath as this
    * one) for ONE job; returns the `SCALING {json}` payload. Falls back to
    * in-process measurement if the spawn fails.
    */
  private def scalingIsolated(job: String, rows: Long, reps: Int): String = {
    val inProcess = () => {
      val (fn, n) =
        if (job == "window") (ScalingBench.windowJob _, rows)
        else (ScalingBench.tokenJob _, rows)
      ScalingBench.measure(fn,
        if (job == "window") "window_features_asof" else "tokenize_fingerprint_quality",
        n, reps).json
    }
    try {
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xdebug"))
      val cmd = (Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.ScalingBench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_SCALE_JOB", job)
      pb.environment().put("SPARK_GRAFT_SCALE_REPS", reps.toString)
      pb.environment().put(
        if (job == "window") "SPARK_GRAFT_SCALE_ROWS" else "SPARK_GRAFT_SCALE_DOCS",
        rows.toString)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
      val rc = proc.waitFor()
      out.find(_.startsWith("SCALING ")) match {
        case Some(line) if rc == 0 => line.stripPrefix("SCALING ")
        case _ =>
          System.err.println(s"[bench] isolated scaling probe '$job' failed (rc=$rc); " +
            "falling back to in-process measurement")
          inProcess()
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] subprocess spawn failed: $e; in-process fallback")
        inProcess()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // part 1: per-query timings (full-column checksum action)
    val s1 = session(cpus)
    s1.sparkContext.setLogLevel("WARN")
    // untimed generic warmup: classloading, parquet reader, shuffle
    // machinery, and the Janino codegen framework otherwise all charge to
    // whichever query runs first (q01 measured ~8 s slower as the opener
    // than in isolation). Per-query codegen compile still counts — that is
    // a real per-query cost.
    locally {
      val warm = s1.read.parquet(s"$sfDir/lineitem.parquet")
      warm.agg(count(lit(1)),
        sum(pmod(xxhash64(warm.columns.map(col): _*), lit(1000000007L)))).collect()
      // ... and the streaming machinery (MicroBatchExecution, state store
      // provider, memory sink): a 2-row MemoryStream aggregate, untimed —
      // otherwise the first streaming query absorbs ~20 s of engine init
      import s1.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s1.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      ms.addData(1L, 2L)
      val wq = ms.toDF().groupBy(col("value")).count()
        .writeStream.format("memory").queryName("__warm_stream")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      wq.awaitTermination()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, dt) = timed {
        try {
          val df = fn(s1, sfDir)
          df.agg(count(lit(1)),
              sum(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L))))
            .collect()
        } catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      }
      name -> dt
    }
    s1.stop()
    ScalingBench.cleanDir(BenchSpillDir) // leftover tmpfs skews part 2

    // part 2: N->4N scaling probes, one fresh JVM per job (arms default
    // 2 vs 8 cores; full methodology + ceiling analysis in BASELINE.md)
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "8000000").toLong
    val scaleDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "400000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "5").toInt
    val w = scalingIsolated("window", scaleN, reps)
    val t = scalingIsolated("tokens", scaleDocs, reps)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":{"window":$w,"tokens":$t}}""")
  }
}
