package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Resumable partitioned job runner: Iceberg-style per-partition commit
  * protocol over plain parquet (no Iceberg jar ships in /opt/spark/jars —
  * SURVEY.md §7). Each logical partition (a bucket of the partition column)
  * is written independently; a JSON manifest is committed ATOMICALLY
  * (write-tmp + rename) after the partition's data lands. On resume,
  * partitions with a committed manifest are skipped — re-running a crashed
  * job converges to the same output (idempotent; checked by
  * CheckpointSpec).
  *
  * The manifest doubles as per-partition LINEAGE + METRICS (north_rule):
  * row count, min/max of the time column, wall-clock duration, throughput,
  * input fingerprint and the Catalyst plan's semanticHash.
  *
  * ≙ the reference's sidecar-index discipline: index once into versioned
  * artifacts next to the data, then serve queries from the artifacts
  * (README.md:383-395, src/utils/common.rs:151-170).
  */
object Checkpoint {

  final case class PartitionManifest(
      bucket: String,
      rows: Long,
      tMin: Long,
      tMax: Long,
      durationSec: Double,
      rowsPerSec: Double,
      planHash: String,
      inputFingerprint: String)

  final case class RunReport(
      written: Seq[PartitionManifest],
      skipped: Seq[String])

  private def manifestPath(outDir: String, bucket: String) =
    Paths.get(s"$outDir/_manifests/bucket=$bucket.json")

  def isCommitted(outDir: String, bucket: String): Boolean =
    Files.exists(manifestPath(outDir, bucket))

  private def writeAtomic(path: java.nio.file.Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def json(m: PartitionManifest): String =
    s"""{"bucket":"${m.bucket}","rows":${m.rows},"t_min":${m.tMin},"t_max":${m.tMax},
       |"duration_sec":${m.durationSec},"rows_per_sec":${m.rowsPerSec},
       |"plan_hash":"${m.planHash}","input_fingerprint":"${m.inputFingerprint}"}"""
      .stripMargin.replace("\n", "")

  /** Run `job` per bucket of `bucketCol`, committing each partition with a
    * manifest; skips already-committed buckets (resume). `timeCol` feeds
    * the manifest's min/max lineage stats.
    */
  def runPartitioned(
      df: DataFrame,
      bucketCol: String,
      buckets: Seq[String],
      outDir: String,
      timeCol: String,
      inputFingerprint: String = ""): RunReport = {
    val planHash = df.queryExecution.analyzed.semanticHash().toHexString
    val (written, skipped) =
      buckets.partition(b => !isCommitted(outDir, b))
    val manifests = written.map { b =>
      val part = df.where(col(bucketCol) === b)
      val t0 = System.nanoTime()
      part.write.mode("overwrite").parquet(s"$outDir/$bucketCol=$b")
      val stats = part.agg(count(lit(1)), min(col(timeCol)), max(col(timeCol)))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = stats.getLong(0)
      val m = PartitionManifest(b, rows,
        if (stats.isNullAt(1)) 0L else stats.getLong(1),
        if (stats.isNullAt(2)) 0L else stats.getLong(2),
        dt, if (dt > 0) rows / dt else 0.0, planHash, inputFingerprint)
      writeAtomic(manifestPath(outDir, b), json(m))
      m
    }
    RunReport(manifests, skipped)
  }

  /** Read back the committed output (all buckets). */
  def readCommitted(spark: SparkSession, outDir: String, bucketCol: String,
      buckets: Seq[String]): DataFrame = {
    val paths = buckets.filter(isCommitted(outDir, _))
      .map(b => s"$outDir/$bucketCol=$b")
    spark.read.parquet(paths: _*)
  }
}
