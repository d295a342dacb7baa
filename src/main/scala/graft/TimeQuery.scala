package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc single-query timer: runs named SparkEntry queries under the same
  * checksum action Bench uses, printing per-run wall clock. For plan/perf
  * iteration without paying a full sweep.
  *
  * Usage: runMain graft.TimeQuery <sfDir> <reps> <queryName>...
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SHUFFLE_PARTITIONS
  * (default 2x cpus).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", (cpus * 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same generic session warmup as Bench part 1
    val warm = spark.read.parquet(s"$sfDir/lineitem.parquet")
    warm.agg(count(lit(1)),
      sum(pmod(xxhash64(warm.columns.map(col): _*), lit(1000000007L)))).collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until reps).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.agg(count(lit(1)),
          sum(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L)))).collect()
        println(f"[time] $name rep=$i t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
