package graft.tmp

import graft.queries.{GffQueries, Views}
import graft.sources.GffSource
import graft.ops.Closure
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for the q32 index build (deleted later). */
object Probe32 {
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
    t("warm")(s.read.parquet(s"$d/lineitem.parquet").count())
    val lines = GffQueries.gffLines(s, d)
    t("render+count lines")(lines.count())
    val parsed = GffSource.parseLines(lines)
    val parsedC = parsed.cache()
    t("parse+cache")(parsedC.count())
    val sorted = parsedC.repartitionByRange(col("line_no"))
      .sortWithinPartitions(col("line_no"))
    val featSchema = sorted.schema.add("fid", org.apache.spark.sql.types.LongType,
      nullable = false)
    val feats = t("zipWithIndex+cache") {
      val f = s.createDataFrame(
        sorted.rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
        }, featSchema).cache()
      f.count(); f
    }
    val entityDict = feats.groupBy(col("seqid"))
      .agg(min(col("line_no")).as("first_ln"))
      .withColumn("entity_id", row_number().over(Window.orderBy(col("first_ln"))).cast("long") - 1)
      .drop("first_ln")
    t("entityDict")(entityDict.count())
    val attrDict = feats.where(col("attr").isNotNull)
      .groupBy(col("attr")).agg(min(col("fid")).as("first_fid"))
      .withColumn("aid", row_number().over(Window.orderBy(col("first_fid"))).cast("long") - 1)
      .drop("first_fid")
    t("attrDict")(attrDict.count())
    val nameToFid = feats.where(col("id").isNotNull)
      .groupBy(col("id")).agg(min(col("fid")).as("pfid"))
    val edges = feats
      .join(nameToFid.withColumnRenamed("id", "parent").withColumnRenamed("pfid", "parent_fid"),
        Seq("parent"), "left")
      .select(col("fid").as("id"),
        coalesce(col("parent_fid"), col("fid")).as("parent"))
    val roots = t("closure") {
      val (r, _) = Closure.resolveRootsReleasable(edges)
      r.count(); r
    }
    val full = feats
      .join(roots.withColumnRenamed("id", "fid").withColumnRenamed("root", "root_fid"), "fid")
      .join(entityDict, "seqid")
      .join(attrDict, Seq("attr"), "left")
      .select("line_no", "fid", "entity_id", "seqid", "ftype", "start", "end",
        "id", "parent", "attr", "aid", "root_fid")
    val fullC = full.cache()
    t("full join + cache")(fullC.count())
    t("checksum")(fullC.agg(count(lit(1)),
      sum(pmod(xxhash64(fullC.columns.map(col): _*), lit(1000000007L)))).collect())
    s.stop()
  }
}
