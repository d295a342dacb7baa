package graft.tmp

import graft.queries.GffQueries
import graft.index.IndexBuild
import org.apache.spark.sql.SparkSession

/** Scratch A/B for IndexBuild.write parallelism (deleted later). */
object Probe51 {
  def t[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime(); val r = body
    println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val idx = t("index")(GffQueries.index(s, d))
    for (i <- 0 until 4)
      t(s"write rep$i")(IndexBuild.write(idx, s"/tmp/probe51_idx$i"))
    s.stop()
  }
}
