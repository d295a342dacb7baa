package graft

/** Host ceiling calibration (no Spark): measures how this box's raw
  * compute and memory-copy throughput scale with thread count, to anchor
  * the scaling-probe analysis in BASELINE.md. Spark operators live between
  * the two curves: whole-stage-codegen'd expression work tracks `compute`;
  * shuffle/sort/WindowExec row traffic tracks `copy` (all threads share
  * one memory bus on this VM).
  *
  * Prints one line per (job, threads): aggregate throughput, plus the
  * N→4N efficiency pairs (2→8, 8→32) per job. Each thread does identical
  * independent work; efficiency = thr(4N) / (4 × thr(N)).
  */
object HostCalib {

  /** Pure-register compute: splitmix64 mixing, zero memory traffic. */
  private def computeWork(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      x ^= z ^ (z >>> 31)
      i += 1
    }
    x
  }

  /** Memory-copy: repeated arraycopy over buffers far larger than LLC. */
  private def copyWork(reps: Int, words: Int): Long = {
    val a = new Array[Long](words)
    val b = new Array[Long](words)
    var i = 0
    while (i < reps) {
      System.arraycopy(a, 0, b, 0, words)
      System.arraycopy(b, 0, a, 0, words)
      i += 1
    }
    a(0) + b(words - 1)
  }

  /** Aggregate ops/sec with `n` threads each running `work` once. */
  private def throughput(n: Int, unitOps: Double)(work: => Long): Double = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until n).map { _ =>
      val t = new Thread(() => { sink.addAndGet(work); () })
      t.start(); t
    }
    ts.foreach(_.join())
    n * unitOps / ((System.nanoTime() - t0) / 1e9)
  }

  private val gaugeWarmed = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def warmGauges(): Unit =
    if (gaugeWarmed.compareAndSet(false, true)) {
      copyWork(2, 4 << 20); computeWork(40000000L); ()
    }

  /** ~1-2 s absolute host-state gauges for the scaling probe's weather
    * filter (see ScalingBench.measure). Steal and the pair-ceiling are
    * both blind to two host modes this box exhibits: neighbor
    * memory-bandwidth pressure (slows wide arms; copies still PAIR-scale
    * fine, so the ceiling stays clean) and lost single-core turbo boost
    * under neighbor load (slows the 1-core arm ~25-40% while the 4-core
    * arm barely moves). `copyGauge` reads the shared-bus bandwidth
    * (2 threads, LLC-busting buffers); `boostGauge` reads the
    * single-thread clock (pure-register work, frequency-proportional).
    * Ops/sec — only RATIOS against the same process's best reading are
    * ever used downstream, so absolute units never matter.
    */
  def copyGauge(): Double = {
    warmGauges()
    val words = 16 << 20 // 128 MiB per buffer
    throughput(2, 2.0 * 8 * words * 8)(copyWork(8, words))
  }

  def boostGauge(): Double = {
    warmGauges()
    val iters = 400000000L
    throughput(1, iters.toDouble)(computeWork(iters))
  }

  /** Reusable N→4N ceiling measurement for ONE job class ("compute" |
    * "copy") at the given thread pair — the per-run calibration the
    * scaling probe ships inside its JSON (VERDICT r2 #1: emit the ceiling
    * next to the measured efficiency instead of pointing at BASELINE.md).
    * Smaller work sizes than [[main]] (seconds, not minutes); same curves.
    */
  def pairEfficiency(job: String, nSmall: Int, nBig: Int): Double = {
    val computeIters = 300000000L
    val copyReps = 20
    val copyWords = 16 << 20 // 128 MiB per buffer
    def work(): Long =
      if (job == "compute") computeWork(computeIters) else copyWork(copyReps, copyWords)
    val unitOps =
      if (job == "compute") computeIters.toDouble else 2.0 * copyReps * copyWords * 8
    throughput(2, unitOps)(work()) // JIT warmup
    val thrS = throughput(nSmall, unitOps)(work())
    val thrB = throughput(nBig, unitOps)(work())
    thrB / ((nBig.toDouble / nSmall) * thrS)
  }

  def main(args: Array[String]): Unit = {
    val threads = Seq(2, 8, 32)
    val computeIters = 600000000L
    val copyReps = 40
    val copyWords = 32 << 20 // 256 MiB per buffer, 2 buffers per thread
    def run(name: String, unitOps: Double)(work: => Long): Map[Int, Double] = {
      // warmup (JIT) then measure, low->high thread counts
      throughput(2, unitOps)(work)
      threads.map { n =>
        val thr = throughput(n, unitOps)(work)
        println(f"CALIB job=$name threads=$n aggregate_ops_per_sec=$thr%.3e")
        n -> thr
      }.toMap
    }
    val comp = run("compute", computeIters.toDouble)(computeWork(computeIters))
    val copy = run("copy", 2.0 * copyReps * copyWords * 8)(copyWork(copyReps, copyWords))
    for ((name, m) <- Seq("compute" -> comp, "copy" -> copy); (a, b) <- Seq((2, 8), (8, 32)))
      println(f"CALIB job=$name pair=${a}->${b} efficiency=${m(b) / (4.0 * m(a))}%.3f")
  }
}
