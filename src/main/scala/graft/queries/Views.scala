package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derived views over the driver's parquet tables
  * (TESTDATA.md). Every view has a DuckDB-SQL twin (the `*Sql` CTE body)
  * computing EXACTLY the same rows — the oracle contract requires the two
  * engines to agree bit-for-bit, so all derivations are plain integer
  * arithmetic / casts available identically in both dialects.
  *
  * feats ≙ the reference's interval-index payload (entity, [start,end),
  * fid, group_id, ftype) — src/utils/tree.rs:6-10 + .gof group ids;
  * probes ≙ query regions (src/commands/intersect.rs:172-230).
  */
object Views {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Per-JVM scratch root for queries that round-trip REAL files (rendered
    * BED/TSV fixtures, checkpoint output). One STABLE directory per
    * (tag, sf-dir) per JVM — repeated bench/verify invocations reuse it
    * instead of leaking a fresh /tmp dir per call (VERDICT r2 "what's
    * wrong" #5); the whole root is deleted on JVM exit.
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    // RAM-backed when the host has it, like the bench spill dir and the
    // streaming checkpoints (r6, guide §6): the q41/q46/q51 round-trip
    // fixtures are written AND re-read inside their timed queries, and
    // /tmp's fsync'd small files were the slowest part of both writes.
    // Scratch is ephemeral by definition; production output goes through
    // real sinks, not this root.
    val base = new java.io.File("/dev/shm")
    val p =
      if (base.isDirectory && base.canWrite)
        java.nio.file.Files.createTempDirectory(base.toPath, "graft_scratch")
      else java.nio.file.Files.createTempDirectory("graft_scratch")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(rm) }
        f.delete(): Unit
      }
      rm(p.toFile)
    }
    p
  }

  def scratchDir(tag: String, d: String): String =
    scratchRoot.resolve(tag + "_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString

  // ---- interval world (from lineitem / orders) ----

  def feats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").select(
      (col("l_partkey") % 16).cast("string").as("entity"),
      ((col("l_orderkey") * 7 + col("l_linenumber") * 13) % 100000).as("start"),
      ((col("l_orderkey") * 7 + col("l_linenumber") * 13) % 100000 + 1 + (col("l_partkey") % 100)).as("end"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("fid"),
      col("l_orderkey").as("group_id"),
      col("l_returnflag").as("ftype"))

  val featsSql: String =
    """feats AS (SELECT CAST(l_partkey % 16 AS VARCHAR) AS entity,
      | (l_orderkey*7 + l_linenumber*13) % 100000 AS f_start,
      | (l_orderkey*7 + l_linenumber*13) % 100000 + 1 + (l_partkey % 100) AS f_end,
      | l_orderkey*10 + l_linenumber AS fid,
      | l_orderkey AS group_id,
      | l_returnflag AS ftype
      | FROM lineitem)""".stripMargin

  /** 1-in-5 subset of orders as probe regions. */
  def probes(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .where(col("o_orderkey") % 5 === 0)
      .select(
        col("o_orderkey").as("probe_id"),
        (col("o_custkey") % 16).cast("string").as("entity"),
        ((col("o_orderkey") * 11) % 100000).as("start"),
        ((col("o_orderkey") * 11) % 100000 + 1 + (col("o_custkey") % 120)).as("end"))

  val probesSql: String =
    """probes AS (SELECT o_orderkey AS probe_id,
      | CAST(o_custkey % 16 AS VARCHAR) AS entity,
      | (o_orderkey*11) % 100000 AS p_start,
      | (o_orderkey*11) % 100000 + 1 + (o_custkey % 120) AS p_end
      | FROM orders WHERE o_orderkey % 5 = 0)""".stripMargin

  /** Bulk probe-interval table — the S3 shape (reference depth.rs:297-423):
    * the PROBE side is the big table (every lineitem row), driving the
    * binned interval join at read-table scale.
    */
  def probesBulk(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("probe_id"),
      (col("l_suppkey") % 16).cast("string").as("entity"),
      ((col("l_orderkey") * 3 + col("l_linenumber") * 17) % 100000).as("start"),
      ((col("l_orderkey") * 3 + col("l_linenumber") * 17) % 100000 + 1 + (col("l_suppkey") % 80)).as("end"))

  val probesBulkSql: String =
    """probes AS (SELECT l_orderkey*10 + l_linenumber AS probe_id,
      | CAST(l_suppkey % 16 AS VARCHAR) AS entity,
      | (l_orderkey*3 + l_linenumber*17) % 100000 AS p_start,
      | (l_orderkey*3 + l_linenumber*17) % 100000 + 1 + (l_suppkey % 80) AS p_end
      | FROM lineitem)""".stripMargin

  /** Small probe subset for raw-pair outputs / broadcast-path queries. */
  def probesSmall(spark: SparkSession, dir: String): DataFrame =
    probes(spark, dir).where(col("probe_id") % 50 === 0)

  val probesSmallSql: String =
    probesSql.replace("o_orderkey % 5 = 0", "o_orderkey % 50 = 0")

  // ---- event world (from events) ----

  /** events with integer micros time + value cents (exact integer math on
    * both engines; doubles only ever copied, never re-aggregated).
    */
  def eventsV(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      col("event_id"),
      col("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("t"),
      col("value"),
      round(col("value") * 100).cast("long").as("cents"))

  val eventsSql: String =
    """e AS (SELECT event_id, user_id, epoch_us(ts) AS t, value,
      | CAST(round(value*100) AS BIGINT) AS cents FROM events)""".stripMargin
}
