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

  def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) s"/dev/shm/graft_spill_$cores"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
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
    out.agg(count(lit(1)), sum(xxhash64(out.columns.map(col): _*)))
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
    out.agg(count(lit(1)), sum(xxhash64(out.columns.map(col): _*)))
      .collect()(0).getLong(0)
  }

  private def timed(body: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  final case class Result(job: String, rowsIn: Long, rowsOut: Long,
      smallSec: Double, bigSec: Double) {
    def efficiency: Double = (smallSec / bigSec) / 4.0
    def json: String =
      s"""{"job":"$job","rows_in":$rowsIn,"rows_out":$rowsOut,
         |"n_small":8,"n_big":32,"small_sec":$smallSec,"big_sec":$bigSec,
         |"small_rows_per_sec":${rowsIn / smallSec},"big_rows_per_sec":${rowsIn / bigSec},
         |"speedup":${smallSec / bigSec},"efficiency":$efficiency}"""
        .stripMargin.replace("\n", "")
  }

  def measure(job: (SparkSession, Long) => Long, name: String, n: Long,
      warmupN: Long, reps: Int): Result = {
    def runsAt(cores: Int): Seq[(Long, Double)] = {
      val s = session(cores)
      s.sparkContext.setLogLevel("WARN")
      try {
        job(s, warmupN) // codegen/JIT warmup, excluded
        (1 to reps).map(_ => timed(job(s, n)))
      } finally s.stop()
    }
    // alternate to spread environment drift across both arms
    val small = runsAt(8)
    val big = runsAt(32)
    val small2 = runsAt(8)
    val big2 = runsAt(32)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val rowsOut = small.head._1
    require((small ++ big ++ small2 ++ big2).forall(_._1 == rowsOut),
      "runs diverged across parallelism levels")
    Result(name, n, rowsOut,
      median((small ++ small2).map(_._2)), median((big ++ big2).map(_._2)))
  }

  def main(args: Array[String]): Unit = {
    val nWin = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROWS", "16000000").toLong
    val nTok = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "2000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "1").toInt
    val w = measure(windowJob, "window_features_asof", nWin, nWin / 50, reps)
    println(s"SCALING ${w.json}")
    val t = measure(tokenJob, "tokenize_fingerprint_quality", nTok, nTok / 50, reps)
    println(s"SCALING ${t.json}")
  }
}
