package graft.tmp

import graft.queries.Views
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: closure round join strategy + timings (deleted later). */
object Probe06 {
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
    t("warm")(s.read.parquet(s"$d/orders.parquet").count())
    val edges = Views.table(s, d, "orders").select(
      col("o_orderkey").as("id"),
      when(col("o_orderkey") < 10, col("o_orderkey"))
        .otherwise(expr("o_orderkey DIV 10")).as("parent"))
    for (rep <- 0 until 2) {
      val base = edges.select(col("id"), coalesce(col("parent"), col("id")).as("root"))
      var cur = base
      var round = 0
      var converged = false
      while (round < 10 && !converged) {
        val next = cur.as("a")
          .join(cur.as("b"), col("a.root") === col("b.id"), "left")
          .select(col("a.id").as("id"),
            coalesce(col("b.root"), col("a.root")).as("root"),
            (coalesce(col("b.root"), col("a.root")) =!= col("a.root")).as("__chg"))
          .cache()
        val changed = t(s"rep$rep round$round join+count") {
          next.where(col("__chg")).limit(1).count()
        }
        if (rep == 0 && round == 0)
          println(next.queryExecution.executedPlan.toString.linesIterator
            .filter(l => l.contains("Join") || l.contains("Exchange"))
            .take(8).mkString("[plan] ", "\n[plan] ", ""))
        cur = next.drop("__chg")
        converged = changed == 0
        round += 1
      }
      t(s"rep$rep final count")(cur.count())
      s.sharedState.cacheManager.clearCache()
    }
    s.stop()
  }
}
