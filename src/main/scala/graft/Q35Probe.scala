package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for q35: times each stage of the intersect
  * match-only pipeline separately (candidate join, group fetch, re-check
  * join, dedup+sort) to attribute the warm wall clock. Like TimeQuery, a
  * perf scalpel — not part of the shipped query surface.
  */
object Q35Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[q35] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // build/caches warm (untimed beyond the first label)
    t("index_build_or_cache") {
      SparkEntry.queries("q32_gff_index")(spark, sfDir).count()
    }
    (0 until 2).foreach { rep =>
      t(s"q35_full rep=$rep") {
        val df = SparkEntry.queries("q35_gff_intersect_matchonly")(spark, sfDir)
        df.agg(count(lit(1)),
          sum(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L)))).collect()
      }
    }
    // stage attribution (counts re-execute upstream stages; read deltas)
    locally {
      import graft.ops.{Contained, IntervalJoin}
      val tbl = graft.queries.GffQueries.index(spark, sfDir)
      val regions = graft.queries.Views.table(spark, sfDir, "orders")
        .where(col("o_orderkey") % 40 === 0)
        .select(concat(lit("chr"), (col("o_orderkey") % 5).cast("string")).as("seqid"),
          ((col("o_orderkey") * 7) % 100000).cast("long").as("start"))
        .withColumn("end", col("start") + 900L)
        .join(tbl.entityDict, "seqid")
        .select("entity_id", "start", "end")
      val probes = regions.select(col("entity_id").as("entity"), col("start"), col("end"))
      val ivs = tbl.intervals.select(col("entity_id").as("entity"), col("start"),
        col("end"), col("root_fid"))
      val nProbes = t("probes_count") { probes.count() }
      val hits = IntervalJoin.join(probes, ivs, Contained)
      val nHits = t("hits_count") { hits.count() }
      val roots = hits.select(col("root_fid")).distinct()
      val nRoots = t("roots_count") { roots.count() }
      val rows = tbl.features.join(roots, "root_fid")
      val nRows = t("rows_count") { rows.count() }
      val lineIvs = rows.withColumnRenamed("entity_id", "entity")
      val rechecked = IntervalJoin.join(probes, lineIvs, Contained)
      val nRe = t("recheck_count") { rechecked.count() }
      val deduped = rechecked.select(rows.columns.map {
        case "entity_id" => col("entity").as("entity_id")
        case "start"     => col("f_start").as("start")
        case "end"       => col("f_end").as("end")
        case c           => col(c)
      }: _*).dropDuplicates("fid")
        .where(col("ftype").isin("exon", "gene")).orderBy(col("line_no"))
      val nOut = t("dedup_sort_count") { deduped.count() }
      println(s"[q35] probes=$nProbes hits=$nHits roots=$nRoots rows=$nRows recheck=$nRe out=$nOut")
    }
    spark.stop()
  }
}
