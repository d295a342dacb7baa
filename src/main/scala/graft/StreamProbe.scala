package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** One-off diagnostic: run the q39/q40 streaming transforms directly with
  * progress reporting, to attribute wall clock between engine phases
  * (addBatch, getBatch, state commit, trigger setup). Not part of the
  * shipped surface — a perf scalpel like TimeQuery.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Views
    import graft.streaming.StreamingFeatures

    val schema = Views.table(spark, sfDir, "events").schema
    def src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1000000")
      .parquet(s"$sfDir/{events.parquet,events.parquet/*.parquet}")

    // candidate generic warmup: tiny MemoryStream flatMapGroupsWithState
    // (engine machinery for the custom-state path, NOT q40's plan)
    if (args.length > 1 && args(1) == "warm") {
      val tw = System.nanoTime()
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      ms.addData(1L, 2L)
      val wq = ms.toDS().groupByKey(_ % 2)
        .flatMapGroupsWithState[Long, Long](
          org.apache.spark.sql.streaming.OutputMode.Append(),
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
          (k: Long, it: Iterator[Long], st: org.apache.spark.sql.streaming.GroupState[Long]) =>
            val s = st.getOption.getOrElse(0L) + it.sum
            st.update(s); Iterator(s)
        }
        .writeStream.format("memory").queryName("__warm_fmgws")
        .outputMode("append")
        .option("checkpointLocation", "/dev/shm/graft_probe_ckpt/warm")
        .trigger(Trigger.AvailableNow()).start()
      wq.awaitTermination()
      println(f"[probe] warmup=${(System.nanoTime() - tw) / 1e9}%.2f s")
    }

    // interleaved A/B: union vs explode alternating within one JVM — the
    // only layout that survives this host's bimodal weather
    (0 until 8).foreach { rep =>
      val useExplode = rep % 2 == 1
      val t0 = System.nanoTime()
      val e = src.select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      val out =
        if (useExplode)
          StreamingFeatures.streamingAsOf(
            StreamingFeatures.taggedExplode(e, col("user_id"), col("t"),
              col("event_id"), (col("t") % 997).cast("double"),
              col("event_id") % 3 === 0))
        else {
          val probes = e.select(col("user_id").cast("string").as("entity"), col("t"),
            col("event_id").as("probe_id"))
          val feats = e.where(col("event_id") % 3 === 0)
            .select(col("user_id").cast("string").as("entity"), col("t"),
              (col("t") % 997).cast("double").as("value"))
          StreamingFeatures.streamingAsOf(
            StreamingFeatures.taggedUnion(probes, feats))
        }
      val ckpt = s"/dev/shm/graft_probe_ckpt/q40-$rep"
      val q = out.toDF().writeStream.outputMode("append").format("memory")
        .queryName(s"probe40_$rep").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val total = (System.nanoTime() - t0) / 1e9
      q.recentProgress.foreach { p =>
        println(s"[probe] rep=$rep batch=${p.batchId} durations=${p.durationMs} rows=${p.numInputRows}")
      }
      println(f"[probe] rep=$rep variant=${if (useExplode) "explode" else "union"} TOTAL=$total%.2f s batches=${q.recentProgress.length}")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
    spark.stop()
  }
}
