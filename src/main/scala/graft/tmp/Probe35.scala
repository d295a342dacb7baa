package graft.tmp

import graft.queries.{GffQueries, Views}
import graft.index.GffOps
import graft.ops.{Contained, IntervalJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for q35 (deleted before round end). */
object Probe35 {
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
    val t0 = t("index build")(GffQueries.index(s, d))
    for (rep <- 0 until 3) {
      val regions = Views.table(s, d, "orders")
        .where(col("o_orderkey") % 40 === 0)
        .select(concat(lit("chr"), (col("o_orderkey") % 5).cast("string")).as("seqid"),
          ((col("o_orderkey") * 7) % 100000).cast("long").as("start"))
        .withColumn("end", col("start") + 900L)
        .join(t0.entityDict, "seqid")
        .select("entity_id", "start", "end")
      val probes = regions.select(col("entity_id").as("entity"), col("start"), col("end"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"probes count rep$rep")(probes.count())
      val ivs = t0.intervals.select(col("entity_id").as("entity"), col("start"),
        col("end"), col("root_fid"))
      val hits = t(s"construct hits rep$rep")(IntervalJoin.join(probes, ivs, Contained))
      val roots = hits.select(col("root_fid")).distinct()
      val rows0 = t0.features.join(roots, "root_fid")
      val rows = rows0.where(col("ftype").isin(Seq("exon", "gene"): _*))
      t(s"rows count rep$rep")(rows.count())
      val lineIvs = rows.withColumnRenamed("entity_id", "entity")
      val recheck = t(s"construct recheck rep$rep")(IntervalJoin.join(probes, lineIvs, Contained))
      val out = recheck
        .select(rows.columns.map {
          case "entity_id" => col("entity").as("entity_id")
          case "start"     => col("f_start").as("start")
          case "end"       => col("f_end").as("end")
          case c           => col(c)
        }: _*).dropDuplicates("fid").orderBy(col("line_no"))
        .select("line_no", "fid", "id", "ftype", "start", "end")
      t(s"out checksum rep$rep")(out.agg(count(lit(1)),
        sum(pmod(xxhash64(out.columns.map(col): _*), lit(1000000007L)))).collect())
      probes.unpersist(false)
    }
    s.stop()
  }
}
