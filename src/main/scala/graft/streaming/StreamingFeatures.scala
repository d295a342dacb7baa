package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY.md §2.7). The reference is batch,
  * but its depth command already processes input in 100k-record
  * micro-batches merged into global state (depth.rs:24, 326-410) — exactly
  * the `foreachBatch` + stateful-agg shape. Batch parity is the contract;
  * streaming is additive: late data beyond the watermark is dropped
  * (the reference has no late-data concept — offline corpus).
  */
object StreamingFeatures {

  /** Tumbling windowed aggregate per user with watermark. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("vsum"))

  /** Session windows (gap-based) per user — the streaming twin of
    * WindowFeatures.sessionize.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("vsum"))

  /** Micro-batch runner with cross-batch state merge (≙ depth.rs
    * partial+final merge, 264-290): each micro-batch computes partial
    * per-user aggregates; `merge` folds them into a global state table.
    * Used with `maxFilesPerTrigger` to bound batch size like BATCH_SIZE.
    */
  def microBatchAggregate(events: DataFrame, stateDir: String): StreamingQuery = {
    val spark = events.sparkSession
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val partial = batch.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("vsum"))
        val merged =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(s"$stateDir/state"))) {
            val prev = batch.sparkSession.read.parquet(s"$stateDir/state")
            prev.unionByName(partial)
              .groupBy(col("user_id"))
              .agg(sum(col("n")).as("n"), sum(col("vsum")).as("vsum"))
          } else partial
        merged.write.mode("overwrite").parquet(s"$stateDir/state_next")
        // atomic-ish swap: state_next -> state
        val fs = new java.io.File(s"$stateDir/state")
        if (fs.exists()) { deleteRec(fs) }
        new java.io.File(s"$stateDir/state_next").renameTo(fs)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .start()
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }
}
