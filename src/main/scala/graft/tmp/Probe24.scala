package graft.tmp

import graft.queries.Views
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch stage-timing probe for q24 (deleted before round end). */
object Probe24 {
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
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_probe"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorOps.dot_f
    val emb = Views.table(s, d, "embeddings")
    t("count")(emb.count())
    val base = emb.withColumn("__n2", dot_f(col("embedding"), col("embedding")))
    val q = base.where(expr("vec_id % 40 = 0"))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("__n2").as("qn2"))
    val n = base.select(col("vec_id").as("nid"), col("embedding").as("ne"), col("__n2").as("nn2"))
    val scored = q.join(n, col("qid") =!= col("nid"))
      .withColumn("cos", dot_f(col("qe"), col("ne")) / sqrt(col("qn2") * col("nn2")))
    for (i <- 0 until 2) {
      t(s"scored.noop rep$i")(scored.write.format("noop").mode("overwrite").save())
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      val full = scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5).select("qid", "nid", "rank", "cos")
      t(s"full.noop rep$i")(full.write.format("noop").mode("overwrite").save())
      t(s"full.checksum rep$i")(full.agg(count(lit(1)),
        sum(pmod(xxhash64(full.columns.map(col): _*), lit(1000000007L)))).collect())
    }
    s.stop()
  }
}
