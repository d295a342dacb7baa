package graft.tmp

import graft.queries.GffQueries
import graft.sources.GffSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: where does q32's parse+cache time go? (deleted later) */
object ProbeParse {
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
    for (rep <- 0 until 3) {
      t(s"render only (count) rep$rep")(GffQueries.gffLines(s, d).count())
      t(s"render+parse (count) rep$rep")(
        GffSource.parseLines(GffQueries.gffLines(s, d)).count())
      val served = Seq("line_no", "seqid", "ftype", "start", "end", "id", "parent", "attr")
      val c = GffSource.parseLines(GffQueries.gffLines(s, d))
        .select(served.map(col): _*).cache()
      t(s"parse+cache fill rep$rep")(c.count())
      c.unpersist(true)
    }
    s.stop()
  }
}
