package graft

import graft.model.Synth
import graft.ops.{AsOfJoin, TextOps, WindowFeatures}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedicated scaling-efficiency probe (north_rule: throughput scaling
  * >= 0.8 from N to 4N executors; sandbox evidence = local[8] vs local[32]
  * on identical input).
  *
  * Measurement discipline: tmpfs shuffle dirs (no disk variance), fresh
  * session per run, warmup excluded, MEDIAN of `reps` alternating runs.
  * Two workloads spanning the engine's profile:
  *  - `window`: sessionize+backfill+lag/lead+rolling+as-of — shuffle/sort
  *    bound (worst case for single-box strong scaling: all 32 threads
  *    share one memory bus, unlike a real 4N-node cluster);
  *  - `tokens`: tokenize+fingerprint+simhash-style hashing over generated
  *    docs — compute bound (best case, embarrassingly parallel).
  */
object ScalingBench {

  /** Two deployment shapes for the N-vs-4N evidence:
    *  - `local` (default): local[8] vs local[32] threads, one JVM;
    *  - `cluster`: local-cluster[2,4,mem] vs local-cluster[8,4,mem] —
    *    SEPARATE executor JVMs (2 vs 8 executors x 4 cores), shuffle over
    *    netty, per-executor GC isolation. This is the literal north_rule
    *    shape (4x the executors), not 4x the threads in one heap.
    * Fixed shuffle-partition count across arms: partitioning is a property
    * of the data layout, not the cluster size — otherwise the small arm
    * gets wider partitions, spills, and fakes super-linear "scaling".
    */
  def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "local")
    // cluster mode: 1-core executors, N = cores/4 of them (2 vs 8) — the
    // box has 32 cores, so even the 4N arm (8 executors + driver) is never
    // CPU-oversubscribed; per-executor shape (1 core, 4g) is constant.
    val master =
      if (mode == "cluster") s"local-cluster[${cores / 4},1,5120]"
      else s"local[$cores]"
    val b = SparkSession.builder()
      .master(master)
      .appName(s"graft-scaling-$cores")
      // fixed partition count across arms (a property of the data layout,
      // not the cluster size); 64 keeps per-partition sorts cache-friendly
      // at bench scale and beats both 16 (arm-asymmetric spill) and giant
      // in-heap sorts (G1 old-gen pressure) in measurements on this box
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) s"/dev/shm/graft_spill_$cores"
        else System.getProperty("java.io.tmpdir"))
    if (mode == "cluster") {
      // ship our compiled classes to the executor JVMs
      val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
      b.config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.memory", "4g")
    }
    b.getOrCreate()
  }

  /** Shuffle/sort-bound: the flagship windowed feature-engineering job. */
  def windowJob(spark: SparkSession, n: Long): Long = {
    val ev = Synth.events(spark, n, nEntities = 4096)
    val sess = WindowFeatures.sessionize(ev, gap = 1000L, tiebreak = "event_id")
    val feat = WindowFeatures.rolling(
      WindowFeatures.backfill(
        WindowFeatures.lagLead(sess, "value", Seq(1, 2), tiebreak = "event_id"),
        "value", tiebreak = "event_id"),
      "event_time", 8, tiebreak = "event_id")
    val dim = Synth.events(spark, n / 16, nEntities = 4096, seed = 99L)
      .groupBy(col("entity"), col("event_time").as("t"))
      .agg(max("value").as("dim_v"))
    val probes = feat.withColumnRenamed("event_time", "t")
    val out = AsOfJoin.windowed(probes, dim)
    // checksum over EVERY column: defeats Catalyst column pruning so the
    // probe actually measures all feature computations, and doubles as a
    // cross-parallelism determinism check (order-insensitive sum of hashes)
    out.agg(count(lit(1)), sum(pmod(xxhash64(out.columns.map(col): _*), lit(1000000007L))))
      .collect()(0).getLong(0)
  }

  /** Compute-bound: token/text feature extraction over generated docs. */
  def tokenJob(spark: SparkSession, n: Long): Long = {
    val docs = Synth.tokenSeqs(spark, n)
      .withColumn("text", concat_ws(" ", expr("transform(tokens, t -> CAST(t AS STRING))")))
      .select(col("doc_id"), col("text"), col("source"))
    val t = TextOps.tokenize(docs)
    val f = TextOps.fingerprint(docs)
    val q = TextOps.quality(docs)
    val out = t.join(f, "doc_id").join(q, "doc_id")
    out.agg(count(lit(1)), sum(pmod(xxhash64(out.columns.map(col): _*), lit(1000000007L))))
      .collect()(0).getLong(0)
  }

  private def timed(body: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  final case class Result(job: String, rowsIn: Long, rowsOut: Long,
      smallSec: Double, bigSec: Double,
      smallRaw: Seq[Double] = Nil, bigRaw: Seq[Double] = Nil) {
    def efficiency: Double =
      if (ScalingBench.weak) smallSec / bigSec
      else (smallSec / bigSec) / (ScalingBench.nBig.toDouble / ScalingBench.nSmall)
    def json: String =
      s"""{"job":"$job","mode":"${if (ScalingBench.weak) "weak" else "strong"}",
         |"rows_in":$rowsIn,"rows_out":$rowsOut,
         |"n_small":${ScalingBench.nSmall},"n_big":${ScalingBench.nBig},
         |"small_raw":${smallRaw.mkString("[", ",", "]")},
         |"big_raw":${bigRaw.mkString("[", ",", "]")},
         |"small_sec":$smallSec,"big_sec":$bigSec,
         |"small_rows_per_sec":${rowsIn / smallSec},"big_rows_per_sec":${rowsIn / bigSec},
         |"speedup":${smallSec / bigSec},"efficiency":$efficiency}"""
        .stripMargin.replace("\n", "")
  }

  def nSmall: Int = sys.env.getOrElse("SPARK_GRAFT_SMALL", "2").toInt
  def nBig: Int = sys.env.getOrElse("SPARK_GRAFT_BIG", "8").toInt

  /** Weak-scaling mode: the 4N arm processes 4x the rows; efficiency =
    * small_sec / big_sec (ideal: the bigger cluster absorbs 4x the data in
    * the same wall clock — the standard cluster-throughput criterion).
    */
  def weak: Boolean = sys.env.getOrElse("SPARK_GRAFT_WEAK", "0") == "1"

  def measure(job: (SparkSession, Long) => Long, name: String, n: Long,
      warmupN: Long, reps: Int): Result = {
    val ratio = nBig / nSmall
    def runsAt(cores: Int): Seq[(Long, Double)] = {
      val s = session(cores)
      s.sparkContext.setLogLevel("WARN")
      val rows = if (weak && cores == nBig) n * ratio else n
      try {
        // warmup at FULL size: JIT, codegen, buffer/heap shaping — the
        // first full-scale run in a session is not representative
        job(s, rows)
        (1 to reps).map(_ => timed(job(s, rows)))
      } finally s.stop()
    }
    // alternate to spread environment drift across both arms
    val small = runsAt(nSmall)
    val big = runsAt(nBig)
    val small2 = runsAt(nSmall)
    val big2 = runsAt(nBig)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val rowsOut = small.head._1
    if (!weak) require((small ++ big ++ small2 ++ big2).forall(_._1 == rowsOut),
      "runs diverged across parallelism levels")
    Result(name, n, rowsOut,
      median((small ++ small2).map(_._2)), median((big ++ big2).map(_._2)),
      (small ++ small2).map(_._2), (big ++ big2).map(_._2))
  }

  def main(args: Array[String]): Unit = {
    val nWin = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "8000000").toLong
    val nTok = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "1000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "1").toInt
    val w = measure(windowJob, "window_features_asof", nWin, nWin / 50, reps)
    println(s"SCALING ${w.json}")
    val t = measure(tokenJob, "tokenize_fingerprint_quality", nTok, nTok / 50, reps)
    println(s"SCALING ${t.json}")
  }
}
